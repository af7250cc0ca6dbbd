"""Trainer — the runtime that drives training/evaluation end to end.

Parity target: reference utils/processor.py (Processor :56-958): work-dir
and log management, data/model/optimizer construction from config, the
epoch loop with warmup+step LR, periodic eval with top-k and score dumps,
checkpointing, and PA-freeze (only_train_part). TPU-native differences:
the hot loop is one jitted XLA program per step, data parallelism is a
sharded jit (no process-per-GPU spawn), and checkpoints are orbax pytrees.
"""

from __future__ import annotations

import json
import os
import pickle
import time
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from agcn_tpu.data import (BatchIterator, SGNDataset, SegmentSampler,
                           SkeletonDataset, make_sgn_collate)
from agcn_tpu.models.registry import build_model
from agcn_tpu.parallel import (jit_data_parallel, make_mesh, replicate_state,
                               shard_batch)
from agcn_tpu.train import losses as L
from agcn_tpu.train import optim as O
from agcn_tpu.train.steps import (TrainState, make_eval_step,
                                  make_multi_train_step, make_train_step)
from agcn_tpu.utils.config import Config, save_config


def _tree_zero_by_name(grads, substr: str):
    """Zero every gradient leaf whose path contains `substr` (PA freeze,
    reference processor.py:612-616, 699-702)."""
    flat = jax.tree_util.tree_flatten_with_path(grads)
    zeroed = []
    for path, leaf in flat[0]:
        names = [getattr(p, "key", str(p)) for p in path]
        if any(substr in str(n) for n in names):
            zeroed.append(jnp.zeros_like(leaf))
        else:
            zeroed.append(leaf)
    return jax.tree_util.tree_unflatten(flat[1], zeroed)


class Trainer:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.work_dir = cfg.work_dir
        # multi-host: process 0 owns every work-dir artifact (log, TB,
        # checkpoints, scores) — the reference's rank-0 gating
        # (processor.py:138-146,777)
        self.is_main = jax.process_index() == 0
        self._guard_work_dir()
        os.makedirs(self.work_dir, exist_ok=True)
        os.makedirs(os.path.join(self.work_dir, "checkpoints"), exist_ok=True)
        os.makedirs(os.path.join(self.work_dir, "score"), exist_ok=True)
        if self.is_main:
            save_config(cfg, os.path.join(self.work_dir, "config.yaml"))
        self._log_file = os.path.join(self.work_dir, "log.txt")
        self._metrics_file = os.path.join(self.work_dir, "metrics.jsonl")
        # TensorBoard event writers (reference processor.py:125-132):
        # train/val scalars land under work_dir/event/{train,val}
        from agcn_tpu.utils.tb_writer import SummaryWriter
        if cfg.phase == "train" and jax.process_index() == 0:
            self.train_writer = SummaryWriter(
                os.path.join(self.work_dir, "event", "train"))
            self.val_writer = SummaryWriter(
                os.path.join(self.work_dir, "event", "val"))
        else:
            self.train_writer = self.val_writer = None

        self.rng = jax.random.PRNGKey(cfg.seed)
        np.random.seed(cfg.seed)

        # mesh ---------------------------------------------------------
        n_dev = len(jax.devices())
        data_axis = cfg.mesh_data or (n_dev // max(cfg.mesh_edge, 1))
        self.mesh = make_mesh(data=data_axis, edge=cfg.mesh_edge)
        self.n_data_shards = data_axis

        self.is_sgn = cfg.use_sgn_dataloader or cfg.feeder == "sgn" \
            or "sgn" in cfg.model.lower()
        self._load_data()
        self._load_model()
        self._load_optimizer()
        self._build_steps()
        self.best_acc = 0.0
        self.best_epoch = -1

    def _guard_work_dir(self):
        """Refuse to clobber a previous run's work dir unless resuming or
        explicitly allowed (reference processor.py:86,100-107 asks
        interactively; we gate on the `assume_yes` flag since the trainer
        may run unattended)."""
        cfg = self.cfg
        marker = os.path.join(self.work_dir, "log.txt")
        if (cfg.phase == "train" and os.path.exists(marker)
                and cfg.start_epoch == 0 and not cfg.weights
                and not cfg.assume_yes and not cfg.auto_resume):
            raise RuntimeError(
                f"work_dir {self.work_dir!r} already contains a run "
                f"(log.txt present). Pass assume_yes=true to reuse it, "
                f"or resume with start_epoch/weights, or pick a new dir.")

    # -- logging -------------------------------------------------------

    def print_log(self, msg: str):
        if not self.is_main:  # rank-0 logging (processor.py:138-146)
            return
        line = f"[{time.strftime('%Y-%m-%d %H:%M:%S')}] {msg}"
        if self.cfg.print_log:
            print(line, flush=True)
        with open(self._log_file, "a") as f:
            f.write(line + "\n")

    def log_metrics(self, **kv):
        if not self.is_main:
            return
        with open(self._metrics_file, "a") as f:
            f.write(json.dumps(kv) + "\n")

    # -- construction --------------------------------------------------

    def _load_data(self):
        cfg = self.cfg
        self.loaders: Dict[str, BatchIterator] = {}
        self.datasets: Dict[str, Any] = {}
        shard_kwargs = dict(num_shards=jax.process_count(),
                            shard_index=jax.process_index())
        if cfg.phase == "train" and cfg.train_feeder_args:
            if self.is_sgn:
                ds = SGNDataset(**cfg.train_feeder_args)
                sampler = SegmentSampler(
                    dataset=cfg.train_feeder_args.get("dataset", "NTU60-CV"),
                    **cfg.train_dataloader_args)
                collate = make_sgn_collate(sampler, train=True)
            else:
                ds = SkeletonDataset(**cfg.train_feeder_args)
                collate = None
            self.datasets["train"] = ds
            self.loaders["train"] = BatchIterator(
                ds, cfg.batch_size, shuffle=True, drop_last=True,
                seed=cfg.seed, collate=collate,
                num_workers=cfg.num_worker, **shard_kwargs)
        if cfg.test_feeder_args:
            if self.is_sgn:
                ds = SGNDataset(**cfg.test_feeder_args)
                sampler = SegmentSampler(
                    dataset=cfg.test_feeder_args.get("dataset", "NTU60-CV"),
                    **cfg.test_dataloader_args)
                self.multi_test = sampler.multi_test
                collate = make_sgn_collate(sampler, train=False,
                                           multi_crop=self.multi_test > 1)
            else:
                ds = SkeletonDataset(**cfg.test_feeder_args)
                collate = None
                self.multi_test = 1
            self.datasets["val"] = ds
            # val is host-sharded too (the reference's DistributedSampler
            # on val, processor.py:524-525); evaluate() gathers and
            # reassembles the interleaved per-process scores
            self.loaders["val"] = BatchIterator(
                ds, cfg.test_batch_size, shuffle=False, drop_last=False,
                seed=cfg.seed, collate=collate, **shard_kwargs)

    def _load_model(self):
        cfg = self.cfg
        model_args = dict(cfg.model_args)
        if cfg.compute_dtype == "bfloat16":
            if "sgn" in cfg.model.lower():
                # SGN runs fp32: at its size bf16 buys nothing (already
                # ~19k seq/s train, tiny activations) and the model has
                # no dtype plumbing — say so instead of silently no-oping
                # the config knob
                self.print_log(
                    "compute_dtype bfloat16 is not supported by the SGN "
                    "families; running float32")
            else:
                model_args.setdefault("dtype", jnp.bfloat16)
        # mesh_edge > 1: construct the model with in-model edge
        # partitioning so the 'edge' mesh axis carries real compute
        # (parallel/edge_partition.model_edge_gcn), not replication
        edge_mesh = self.mesh if cfg.mesh_edge > 1 else None
        self.model = build_model(cfg.model, model_args, edge_mesh=edge_mesh)
        example = self._example_input()
        variables = self.model.init(self.rng, example, train=False)
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(self.params))
        self.print_log(f"Model {cfg.model} built: {n_params:,} params")
        self._snapshot_model_source()
        if cfg.weights:
            self._load_weights(cfg.weights, cfg.ignore_weights)

    def _snapshot_model_source(self):
        """Copy the model's source file into the work dir for per-run code
        provenance (reference processor.py:288-290)."""
        import inspect
        import shutil

        try:
            src = inspect.getsourcefile(type(self.model))
            if src and os.path.exists(src):
                shutil.copy2(src, os.path.join(
                    self.work_dir, os.path.basename(src)))
        except (TypeError, OSError):
            pass

    def _example_input(self):
        cfg = self.cfg
        if self.is_sgn:
            seg = cfg.train_dataloader_args.get(
                "seg", cfg.test_dataloader_args.get("seg", 20))
            v = cfg.model_args.get("num_point", 25)
            c = cfg.model_args.get("in_channels", 3)
            return jnp.zeros((2, seg, v * c), jnp.float32)
        v = cfg.model_args.get("num_point", 25)
        m = cfg.model_args.get("num_person", 2)
        c = cfg.model_args.get("in_channels", 3)
        return jnp.zeros((2, c, 16, v, m), jnp.float32)

    def _load_weights(self, path: str, ignore: list):
        """Load an orbax/npz checkpoint; substring-filtered like the
        reference's --ignore-weights (processor.py:251-259). `.pt` files
        are treated as reference PyTorch checkpoints and mapped through
        agcn_tpu.utils.torch_import."""
        from agcn_tpu.train.checkpoint import load_checkpoint, merge_params
        if path.endswith(".pt"):
            ckpt = self._load_torch_checkpoint(path)
        else:
            ckpt = load_checkpoint(path)
        self.params = merge_params(self.params, ckpt.get("params", {}),
                                   ignore, log=self.print_log)
        # schedule geometry the checkpoint was trained with: lets the
        # test phase / resume-for-eval reconstruct the exact LR schedule
        # without access to the training dataset
        if "steps_per_epoch" in ckpt:
            self._ckpt_steps_per_epoch = int(ckpt["steps_per_epoch"])
        if "batch_stats" in ckpt:
            self.batch_stats = merge_params(
                self.batch_stats, ckpt["batch_stats"], ignore,
                log=self.print_log)
        self.print_log(f"Loaded weights from {path}")

    def _load_torch_checkpoint(self, path: str):
        """Map a reference PyTorch checkpoint onto our parameter layout
        (migration path for existing 2s-AGCN checkpoints)."""
        import torch

        from agcn_tpu.utils import torch_import as ti

        sd = torch.load(path, map_location="cpu", weights_only=True)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        from agcn_tpu.models.registry import _ALIASES

        name = _ALIASES.get(self.cfg.model, self.cfg.model).lower()
        if name == "sgn_original":
            return ti.sgn_original_variables_from_torch(sd)
        if "sgn" in name:
            return ti.sgn_variables_from_torch(sd)
        if "aagcn" in name:
            return ti.aagcn_variables_from_torch(
                sd, adaptive=self.cfg.model_args.get("adaptive", True))
        return ti.agcn_variables_from_torch(sd)

    def _load_optimizer(self):
        cfg = self.cfg
        if "train" in self.loaders:
            steps_per_epoch = max(len(self.loaders["train"]), 1)
        elif getattr(self, "_ckpt_steps_per_epoch", 0) > 0:
            # test phase: the checkpoint records the TRAIN-set schedule
            # geometry it was produced under, so a schedule-dependent
            # resume-for-eval reconstructs the exact LR at that step
            steps_per_epoch = self._ckpt_steps_per_epoch
        elif "val" in self.loaders:
            # legacy checkpoints without the field: approximate from the
            # eval dataset (better than 1, may differ from train geometry)
            steps_per_epoch = max(
                len(self.datasets["val"]) // max(cfg.batch_size, 1), 1)
        else:
            steps_per_epoch = 1
        self.steps_per_epoch = steps_per_epoch
        if cfg.scheduler == "onecyclelr":
            sched = O.onecycle_schedule(
                cfg.base_lr, steps_per_epoch, cfg.num_epoch,
                cfg.warm_up_epoch, cfg.initial_lr or None,
                cfg.final_lr or None, cfg.anneal_strategy)
        elif cfg.scheduler in ("cycliclr", "cycliclrtri2"):
            sched = O.cyclic_schedule(
                cfg.base_lr, steps_per_epoch,
                "triangular2" if cfg.scheduler.endswith("tri2")
                else "triangular")
        else:
            sched = O.warmup_step_schedule(
                cfg.base_lr, steps_per_epoch, cfg.step, cfg.warm_up_epoch)
        self.schedule = sched
        self.tx = O.build_optimizer(
            cfg.optimizer, sched, cfg.weight_decay, cfg.nesterov, cfg.eps,
            grad_clip=cfg.grad_clip)
        if "LLRD" in cfg.optimizer.upper() and cfg.llrd_factor != 1.0:
            self.tx = O.with_llrd(self.tx, self.params, cfg.llrd_factor)
        self.state = TrainState.create(self.model.apply, self.params,
                                       self.batch_stats, self.tx)
        if cfg.weights:
            self._maybe_resume_opt_state(cfg.weights)
        elif cfg.auto_resume and cfg.phase == "train":
            self._auto_resume()
        if self.n_data_shards > 1:
            self.state = replicate_state(self.mesh, self.state)

    def _auto_resume(self):
        """Crash-resilient restart: pick up the newest checkpoint in this
        work dir (params + batch_stats + opt state + epoch) without any
        CLI plumbing. The reference has no elastic recovery (SURVEY
        §5.3) — resume there is manual --start-epoch/--weights."""
        from agcn_tpu.train.checkpoint import load_checkpoint, merge_params
        ckpt_dir = os.path.join(self.work_dir, "checkpoints")
        if not os.path.isdir(ckpt_dir):
            return
        cands = []
        for name in os.listdir(ckpt_dir):
            tail = name.rsplit("_", 1)[-1]
            # orbax dirs are 'epoch_N'; the npz fallback writes
            # 'epoch_N.npz' — both must be resumable
            if tail.endswith(".npz"):
                tail = tail[:-len(".npz")]
            if tail.isdigit():
                cands.append((int(tail), os.path.join(ckpt_dir, name)))
        if not cands:
            return
        epoch, path = max(cands)
        try:
            ckpt = load_checkpoint(path)
        except Exception as e:
            self.print_log(f"auto-resume skipped ({e})")
            return
        self.params = merge_params(self.params, ckpt.get("params", {}),
                                   [], log=self.print_log)
        if "batch_stats" in ckpt:
            self.batch_stats = merge_params(
                self.batch_stats, ckpt["batch_stats"], [],
                log=self.print_log)
        self.state = TrainState.create(self.model.apply, self.params,
                                       self.batch_stats, self.tx)
        self._maybe_resume_opt_state(path)
        self.cfg.start_epoch = int(ckpt.get("epoch", epoch - 1)) + 1
        self.print_log(f"auto-resumed from {path} "
                       f"(continuing at epoch {self.cfg.start_epoch})")

    def _maybe_resume_opt_state(self, path: str):
        """Restore optimizer state + step for exact resume when the
        checkpoint carries them (reference resumes via --start-epoch +
        --weights, processor.py:233-245)."""
        from agcn_tpu.train.checkpoint import load_checkpoint
        import jax.numpy as jnp_

        try:
            ckpt = load_checkpoint(path)
        except Exception:
            return
        if "opt_leaves" in ckpt:
            leaves = [ckpt["opt_leaves"][k]
                      for k in sorted(ckpt["opt_leaves"],
                                      key=lambda s: int(s))]
            treedef = jax.tree_util.tree_structure(self.state.opt_state)
            try:
                opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
                step = jnp_.asarray(int(ckpt.get("step", 0)), jnp_.int32)
                self.state = self.state.replace(opt_state=opt_state,
                                                step=step)
                self.print_log(f"optimizer state resumed at step "
                               f"{int(step)}")
            except Exception as e:
                self.print_log(f"opt-state resume skipped: {e}")

    def _build_aux_loss(self):
        """Auxiliary losses: InfoGCN-style MMD on the latent z
        (reference processor.py:563-581, loss scaled by mmd_lambda2 on
        the class-mean MSE and mmd_lambda1 on ||mean z||) and cosine
        feature-similarity between temporal-branch outputs
        (processor.py:583-595)."""
        cfg = self.cfg
        use_mmd = cfg.mmd_lambda1 > 0 or cfg.mmd_lambda2 > 0
        use_fsim = cfg.fsim_mode > 0
        if not (use_mmd or use_fsim):
            return None
        num_class = cfg.model_args.get("num_class", 60)
        z_prior = None
        if use_mmd:
            import jax.random as jrandom

            # fallback prototypes for models WITHOUT the InfoGCN head; a
            # model exposing aux["z_prior"] (SGN with infogcn_* set,
            # reference sgn_v12.py:626,812) always wins below
            key = jrandom.PRNGKey(cfg.seed)
            dim = 512  # SGN c4 head width
            z_prior = jrandom.normal(key, (num_class, dim))
            z_prior = z_prior / jnp.linalg.norm(z_prior, axis=-1,
                                                keepdims=True)

        def aux_loss(aux, y):
            from agcn_tpu.train import losses as L2

            total = 0.0
            metrics = {}
            if use_mmd and aux is not None and "z" in aux:
                z = aux["z"]
                prior = aux.get("z_prior", z_prior)
                if prior.shape[-1] != z.shape[-1]:
                    reps = -(-z.shape[-1] // prior.shape[-1])
                    prior = jnp.tile(prior, (1, reps))[:, : z.shape[-1]]
                mmd, l2z = L2.mmd_loss(z, prior, y, num_class)
                total = total + cfg.mmd_lambda2 * mmd \
                    + cfg.mmd_lambda1 * l2z
                # cos/dist diagnostics of the class means (reference
                # get_vector_property, processor.py:43-53)
                onehot = jax.nn.one_hot(y, num_class, dtype=z.dtype)
                counts = jnp.maximum(onehot.sum(0), 1.0)
                means = (onehot.T @ z) / counts[:, None]
                normed = means / jnp.maximum(
                    jnp.linalg.norm(means, axis=-1, keepdims=True), 1e-9)
                cos = normed @ normed.T
                off = 1.0 - jnp.eye(num_class, dtype=z.dtype)
                denom = jnp.maximum(off.sum(), 1.0)
                cos_z = (cos * off).sum() / denom
                dist = jnp.linalg.norm(
                    means[:, None] - means[None], axis=-1)
                dist_z = (dist * off).sum() / denom
                metrics.update(mmd=mmd, l2_z_mean=l2z, cos_z=cos_z,
                               dist_z=dist_z)
                # prior diagnostics (reference processor.py:575,580-581)
                pn = prior / jnp.maximum(jnp.linalg.norm(
                    prior, axis=-1, keepdims=True), 1e-9)
                pcos = pn @ pn.T
                poff = 1.0 - jnp.eye(prior.shape[0], dtype=prior.dtype)
                pdenom = jnp.maximum(poff.sum(), 1.0)
                metrics.update(
                    cos_z_prior=(pcos * poff).sum() / pdenom,
                    dist_z_prior=(jnp.linalg.norm(
                        prior[:, None] - prior[None], axis=-1)
                        * poff).sum() / pdenom)
            if use_fsim and aux is not None \
                    and len(aux.get("branch_outputs", [])) > 1:
                alphas = cfg.fsim_alpha if isinstance(
                    cfg.fsim_alpha, (list, tuple)) else [cfg.fsim_alpha]
                # kernels per level = len(multi_t[-1])
                # (reference processor.py:586-588)
                multi_t = cfg.model_args.get("multi_t", [[], [], [3]])
                kernels = len(multi_t[-1]) if multi_t else 1
                fsim_total = L2.fsim_pair_loss(
                    aux["branch_outputs"], alphas, kernels,
                    mode=cfg.fsim_mode)
                total = total + fsim_total
                metrics.update(fsim=fsim_total)
            return total, metrics

        return aux_loss

    def _build_steps(self):
        cfg = self.cfg
        loss_fn = L.build_loss(cfg.loss, cfg.model_args.get("num_class", 60),
                               smoothing=cfg.label_smoothing,
                               alpha=cfg.fl_alpha, gamma=cfg.fl_gamma)
        sam_rho = cfg.sam_rho if cfg.optimizer.upper().startswith("SAM") \
            else 0.0
        aux_loss_fn = self._build_aux_loss()
        base_step = make_train_step(loss_fn, sam_rho=sam_rho,
                                    aux_loss_fn=aux_loss_fn)
        frozen_step = make_train_step(
            loss_fn, sam_rho=sam_rho, aux_loss_fn=aux_loss_fn,
            grad_transform=lambda g: _tree_zero_by_name(g, "PA"))
        self._loss_fn = loss_fn

        def compile_step(fn):
            # donate the input TrainState: the loop replaces it with the
            # step's output (self.state = step(self.state, ...)), so XLA
            # can update params/opt-state in place instead of allocating
            # a second copy — on TPU this removes a full state-sized
            # HBM round-trip per step (the benches in tools/ already
            # measure with donation; this aligns the product path)
            if self.n_data_shards > 1:
                return jit_data_parallel(fn, self.mesh, donate_state=True)
            return jax.jit(fn, donate_argnums=(0,))

        self._train_step = compile_step(base_step)
        # PA frozen while epoch <= only_train_epoch
        # (reference processor.py:612-630)
        self._train_step_frozen = compile_step(frozen_step) \
            if cfg.only_train_part else self._train_step
        # K optimizer steps per XLA dispatch (steps.make_multi_train_step;
        # exactly sequential semantics). Single-shard only: the sharded
        # path's batch-axis annotations assume a leading batch dim.
        self._steps_per_call = max(1, int(getattr(cfg, "steps_per_call",
                                                  1) or 1))
        if self._steps_per_call > 1 and self.n_data_shards > 1:
            self.print_log("steps_per_call > 1 requires a single data "
                           "shard; falling back to 1")
            self._steps_per_call = 1
        if self._steps_per_call > 1:
            spc = self._steps_per_call
            mk = lambda **kw: make_multi_train_step(
                loss_fn, spc, sam_rho=sam_rho, aux_loss_fn=aux_loss_fn,
                **kw)
            self._train_step_multi = jax.jit(mk(), donate_argnums=(0,))
            self._train_step_multi_frozen = jax.jit(
                mk(grad_transform=lambda g: _tree_zero_by_name(g, "PA")),
                donate_argnums=(0,)) if cfg.only_train_part \
                else self._train_step_multi
        crops = getattr(self, "multi_test", 1)
        self._eval_aux = aux_loss_fn
        eval_step = make_eval_step(loss_fn, multi_crop=crops,
                                   aux_loss_fn=aux_loss_fn)
        # eval shards over the data axis too when the fixed (padded)
        # eval batch divides evenly; otherwise single-program eval
        self._eval_rows = cfg.test_batch_size * max(crops, 1)
        self._eval_sharded = (self.n_data_shards > 1
                              and self._eval_rows % self.n_data_shards
                              == 0)
        if self._eval_sharded:
            from agcn_tpu.parallel import mesh as M
            self._eval_step = jax.jit(
                eval_step,
                in_shardings=(M.replicated(self.mesh),
                              M.batch_sharding(self.mesh),
                              M.replicated(self.mesh)),
                out_shardings=M.replicated(self.mesh))
        else:
            self._eval_step = jax.jit(eval_step)

    # -- phases --------------------------------------------------------

    def start(self):
        cfg = self.cfg
        if cfg.phase == "train":
            for epoch in range(cfg.start_epoch, cfg.num_epoch):
                self.train_epoch(epoch)
                if (epoch + 1) % cfg.eval_interval == 0 \
                        or epoch + 1 == cfg.num_epoch:
                    self.evaluate(epoch, save_score=cfg.save_score)
                if (epoch + 1) % cfg.save_interval == 0 \
                        or epoch + 1 == cfg.num_epoch:
                    self.save_checkpoint(epoch)
            self.print_log(
                f"Best top-1: {self.best_acc:.4f} @ epoch {self.best_epoch}")
            if cfg.async_checkpoint:
                from agcn_tpu.train.checkpoint import wait_for_checkpoints
                wait_for_checkpoints()
        elif cfg.phase == "test":
            if not cfg.weights:
                raise ValueError("--weights required for phase test")
            self.evaluate(0, save_score=cfg.save_score,
                          write_predictions=True)
        else:
            raise ValueError(f"Unknown phase {cfg.phase}")

    def train_epoch(self, epoch: int):
        cfg = self.cfg
        loader = self.loaders["train"]
        loader.set_epoch(epoch)
        self.rng, epoch_rng = jax.random.split(self.rng)
        t0 = time.time()
        seen = 0
        last_metrics = {}
        # profiler: trace a window of early steps into work_dir/trace
        # (reference torch.profiler schedule wait=1 warmup=1 active=5,
        # processor.py:189-197)
        profile_steps = range(2, 8) if (cfg.profiler and epoch
                                        == cfg.start_epoch) else range(0)
        if self._steps_per_call > 1 and not profile_steps:
            # K steps per dispatch (lax.scan; exactly sequential
            # semantics). The profiled epoch keeps the per-step loop so
            # trace windows align with dispatch boundaries.
            return self._train_epoch_scanned(epoch, loader, epoch_rng, t0)
        for i, (x, y, idx) in enumerate(loader):
            if i == (profile_steps.start if profile_steps else -1):
                jax.profiler.start_trace(
                    os.path.join(self.work_dir, "trace"))
            if self.is_sgn:
                xb = x  # (B, seg, VC)
            else:
                xb = x  # (B, C, T, V, M)
            if self.n_data_shards > 1:
                xb, yb = shard_batch(self.mesh, xb, y)
            else:
                xb, yb = jnp.asarray(xb), jnp.asarray(y)
            step_fn = (self._train_step_frozen
                       if cfg.only_train_part
                       and epoch <= cfg.only_train_epoch
                       else self._train_step)
            self.state, metrics = step_fn(self.state, xb, yb, epoch_rng)
            if profile_steps and i == profile_steps.stop - 1:
                jax.block_until_ready(metrics["loss"])
                jax.profiler.stop_trace()
                self.print_log(f"profiler trace written to "
                               f"{os.path.join(self.work_dir, 'trace')}")
            seen += len(y)
            if (i + 1) % cfg.log_interval == 0:
                m = {k: float(v) for k, v in metrics.items()}
                lr = float(self.schedule(int(self.state.step)))
                self.print_log(
                    f"epoch {epoch} step {i + 1}/{len(loader)} "
                    f"loss {m['loss']:.4f} acc {m['acc']:.3f} lr {lr:.5f}")
                if self.train_writer is not None:
                    step = int(self.state.step)
                    self.train_writer.add_scalar("train/loss", m["loss"],
                                                 step)
                    self.train_writer.add_scalar("train/acc", m["acc"],
                                                 step)
                    self.train_writer.add_scalar("train/lr", lr, step)
            last_metrics = metrics
        if profile_steps and len(loader) < profile_steps.stop:
            try:
                jax.profiler.stop_trace()
            except RuntimeError:
                pass
        dt = time.time() - t0
        m = {k: float(v) for k, v in last_metrics.items()} if last_metrics \
            else {}
        self.log_metrics(kind="train", epoch=epoch, seconds=dt,
                         seq_per_sec=seen / max(dt, 1e-9), **m)
        if self.train_writer is not None:
            self.train_writer.add_scalar("train/epoch", epoch,
                                         int(self.state.step))
            self.train_writer.flush()
        self.print_log(
            f"epoch {epoch} done in {dt:.1f}s "
            f"({seen / max(dt, 1e-9):.1f} seq/s)")

    def _train_epoch_scanned(self, epoch: int, loader, epoch_rng, t0):
        """Epoch loop at steps_per_call granularity: K loader batches are
        stacked on the host and consumed by ONE scanned XLA program
        (steps.make_multi_train_step); a short remainder runs through the
        single-step program. Per-step logging cadence is preserved from
        the stacked per-step metrics."""
        cfg = self.cfg
        spc = self._steps_per_call
        frozen = cfg.only_train_part and epoch <= cfg.only_train_epoch
        multi_fn = (self._train_step_multi_frozen if frozen
                    else self._train_step_multi)
        single_fn = (self._train_step_frozen if frozen
                     else self._train_step)
        n_steps = len(loader)
        seen = 0
        gi = 0  # per-step index within the epoch (logging cadence)
        step0 = int(self.state.step)  # one sync, before the loop
        last_metrics: Dict[str, float] = {}

        def log_step(m: Dict[str, float], step_no: int):
            lr = float(self.schedule(step_no))
            self.print_log(
                f"epoch {epoch} step {gi}/{n_steps} "
                f"loss {m['loss']:.4f} acc {m['acc']:.3f} lr {lr:.5f}")
            if self.train_writer is not None:
                self.train_writer.add_scalar("train/loss", m["loss"],
                                             step_no)
                self.train_writer.add_scalar("train/acc", m["acc"],
                                             step_no)
                self.train_writer.add_scalar("train/lr", lr, step_no)

        buf_x, buf_y = [], []
        for x, y, _ in loader:
            buf_x.append(np.asarray(x))
            buf_y.append(np.asarray(y))
            seen += len(y)
            if len(buf_x) < spc:
                continue
            xs = jnp.asarray(np.stack(buf_x))
            ys = jnp.asarray(np.stack(buf_y))
            buf_x, buf_y = [], []
            base_step = int(step0) + gi  # host-side: step0 + steps done
            self.state, ms = multi_fn(self.state, xs, ys, epoch_rng)
            rows = None
            for j in range(spc):
                gi += 1
                if gi % cfg.log_interval == 0:
                    # the only device sync in the loop, and only on
                    # logged steps — host batch-stacking stays
                    # overlapped with device compute otherwise
                    if rows is None:
                        rows = {k: np.asarray(v) for k, v in ms.items()}
                    log_step({k: float(v[j]) for k, v in rows.items()},
                             base_step + j + 1)
            last_metrics = ms  # device arrays; fetched at epoch end
        for x, y in zip(buf_x, buf_y):  # remainder < spc
            self.state, m = single_fn(self.state, jnp.asarray(x),
                                      jnp.asarray(y), epoch_rng)
            gi += 1
            last_metrics = m
            if gi % cfg.log_interval == 0:
                log_step({k: float(v) for k, v in m.items()},
                         int(self.state.step))

        dt = time.time() - t0
        last = {k: float(np.asarray(v).reshape(-1)[-1])
                for k, v in last_metrics.items()}
        self.log_metrics(kind="train", epoch=epoch, seconds=dt,
                         seq_per_sec=seen / max(dt, 1e-9), **last)
        if self.train_writer is not None:
            self.train_writer.add_scalar("train/epoch", epoch,
                                         int(self.state.step))
            self.train_writer.flush()
        self.print_log(
            f"epoch {epoch} done in {dt:.1f}s "
            f"({seen / max(dt, 1e-9):.1f} seq/s)")

    def evaluate(self, epoch: int, save_score: bool = False,
                 write_predictions: bool = False):
        cfg = self.cfg
        if "val" not in self.loaders:
            return
        loader = self.loaders["val"]
        ds = self.datasets["val"]
        scores = []
        aux_metrics = []
        t0 = time.time()
        crops = max(getattr(self, "multi_test", 1), 1)
        full = self._eval_rows  # fixed compiled batch shape (rows)
        for x, y, idx in loader:
            n_real = x.shape[0]
            if crops > 1 and n_real % crops != 0:
                raise RuntimeError(
                    f"eval batch of {n_real} rows is not a multiple of "
                    f"multi_test={crops}; collate must expand each sample "
                    f"into consecutive crops")
            if n_real < full:
                # pad the trailing partial batch so eval stays one XLA
                # program; pad rows form whole crop groups and are
                # sliced off below
                pad = np.zeros((full - n_real,) + x.shape[1:], x.dtype)
                x = np.concatenate([x, pad], axis=0)
            if self._eval_sharded:
                xb = shard_batch(self.mesh, x)
            else:
                xb = jnp.asarray(x)
            nproc = jax.process_count()
            if self._eval_aux is not None and n_real == full \
                    and nproc == 1:
                # aux (MMD on crop-averaged z, processor.py:563-567)
                # eval metrics on full batches; skipped multi-host (the
                # labels ride a replicated in_sharding, which cannot
                # carry per-process shards)
                yb = jnp.asarray(np.asarray(y)[::crops])
                logits, m = self._eval_step(self.state, xb, yb)
                aux_metrics.append({k: float(v) for k, v in m.items()})
            else:
                logits, _ = self._eval_step(self.state, xb, None)
            lg = np.asarray(logits)
            m_rows = n_real // crops
            if nproc > 1 and self._eval_sharded:
                # replicated output = logits for the GLOBAL batch: P
                # process blocks of full/crops sample rows each (the
                # global array concatenates process-local shards in
                # process order). The host-sharded val iterator gives
                # process p the padded samples p, p+P, p+2P, ..., so
                # interleaving the blocks reconstructs the padded order
                # (the reference's all_gather_object + round-robin
                # reassembly, processor.py:862-868).
                per_block = full // crops
                inter = np.empty((m_rows * nproc,) + lg.shape[1:],
                                 lg.dtype)
                for p in range(nproc):
                    inter[p::nproc] = lg[p * per_block:
                                         p * per_block + m_rows]
                scores.append(inter)
            else:
                scores.append(lg[:m_rows])
        score = np.concatenate(scores, axis=0)
        if jax.process_count() > 1 and not self._eval_sharded:
            # non-sharded eval computed process-local scores — gather
            # across processes and reassemble the interleave
            from jax.experimental import multihost_utils
            gathered = np.asarray(multihost_utils.process_allgather(score))
            nproc = gathered.shape[0]
            glob = np.empty((nproc * gathered.shape[1],)
                            + gathered.shape[2:], gathered.dtype)
            for p in range(nproc):
                glob[p::nproc] = gathered[p]
            score = glob
        score = score[: len(ds)]
        accs = {k: ds.top_k(score, k) for k in cfg.show_topk}
        dt = time.time() - t0
        if accs.get(1, 0.0) > self.best_acc:
            self.best_acc = accs.get(1, 0.0)
            self.best_epoch = epoch
        msg = ", ".join(f"top-{k}: {v:.4f}" for k, v in accs.items())
        self.print_log(f"eval epoch {epoch}: {msg} ({dt:.1f}s)")
        aux_means = {}
        if aux_metrics:
            aux_means = {k: float(np.mean([m[k] for m in aux_metrics]))
                         for k in aux_metrics[0]}
            self.print_log("eval aux: " + ", ".join(
                f"{k} {v:.4f}" for k, v in aux_means.items()))
        self.log_metrics(kind="eval", epoch=epoch, seconds=dt,
                         **{f"top{k}": v for k, v in accs.items()},
                         **aux_means)
        if self.val_writer is not None:
            for k, v in accs.items():
                self.val_writer.add_scalar(f"val/top{k}", v,
                                           int(self.state.step))
            self.val_writer.flush()
        if save_score and self.is_main:
            names = getattr(ds, "sample_name",
                            np.arange(len(ds)))
            out = {str(n): s for n, s in zip(names, score)}
            path = os.path.join(self.work_dir, "score",
                                f"epoch{epoch + 1}_val.pkl")
            with open(path, "wb") as f:
                pickle.dump(out, f)
        if write_predictions and self.is_main:
            pred = score.argmax(-1)
            with open(os.path.join(self.work_dir, "right.txt"), "w") as fr, \
                    open(os.path.join(self.work_dir, "wrong.txt"), "w") as fw:
                for i, (p, l) in enumerate(zip(pred, ds.label)):
                    line = f"{i},{p},{l}\n"
                    (fr if p == l else fw).write(line)
        return accs

    def save_checkpoint(self, epoch: int):
        if not self.is_main:  # rank-0 saves (processor.py:777)
            return
        from agcn_tpu.train.checkpoint import save_checkpoint
        # filename prefix from model_saved_name (reference names weights
        # {model_saved_name}-{epoch}-{global_step}.pt, processor.py:225-231)
        prefix = self.cfg.model_saved_name or "epoch"
        prefix = os.path.basename(prefix) or "epoch"
        path = os.path.join(self.work_dir, "checkpoints",
                            f"{prefix}_{epoch + 1}")
        opt_leaves = {
            f"{i:04d}": np.asarray(leaf) for i, leaf in enumerate(
                jax.tree_util.tree_leaves(
                    jax.device_get(self.state.opt_state)))
        }
        save_checkpoint(path, {
            "params": jax.device_get(self.state.params),
            "batch_stats": jax.device_get(self.state.batch_stats),
            "opt_leaves": opt_leaves,
            "step": int(self.state.step),
            "epoch": epoch,
            "steps_per_epoch": int(self.steps_per_epoch),
        }, async_save=self.cfg.async_checkpoint,
            # orbax saves are collective across processes; this method
            # runs on rank 0 only, so multi-process runs take the pure
            # host-side npz path
            use_orbax=jax.process_count() == 1)
        if self.cfg.async_checkpoint and jax.process_count() > 1 \
                and not getattr(self, "_warned_sync_save", False):
            self._warned_sync_save = True
            self.print_log("async_checkpoint is synchronous in "
                           "multi-process runs (rank-0 npz saves; orbax "
                           "async saves are collective)")
        self.print_log(f"checkpoint saved: {path}")
