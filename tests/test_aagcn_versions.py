"""Per-version weight-transplant parity for the AAGCN transformer
variants that are runnable in the mounted reference (v17, v24, v30,
v31, v32, v34).

v29 / v33 / v35 / v36 / v37 are broken as shipped (NameError on TCNUnit,
per-person CLS concat mismatch, rel-table length mismatch,
crossattention.py output_dim=-1 crash) — verified by
test_broken_versions_documented below, which asserts the breakage so a
reference update that fixes them will surface here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agcn_tpu.graph import build_adjacency
from agcn_tpu.models.aagcn_versions import AAGCNv17, AAGCNv30
from agcn_tpu.utils.torch_import import (aagcn_v17_variables_from_torch,
                                         aagcn_v30_variables_from_torch)

from .conftest import add_reference_to_path, reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference not mounted")

GRAPH = "graph.ntu_rgb_d.Graph"


def _input(n=2, t=60, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, 3, t, 25, 2)).astype(np.float32)


@pytest.mark.parametrize("kwargs", [
    dict(pos_enc="True", classifier_type="CLS", trans_num_layers=2),
    dict(pos_enc="cossin", classifier_type="GAP", trans_num_layers=1),
    dict(pos_enc="cossin", classifier_type="CLS", trans_num_layers=2,
         attn_masking="backward"),
    dict(pos_enc="True", classifier_type="CLS", trans_num_layers=1,
         trans_prenorm=True),
])
def test_v17_parity(kwargs):
    add_reference_to_path()
    import torch
    from model.architecture.aagcn.aagcn_v17 import Model as TorchV17

    torch.manual_seed(0)
    ref = TorchV17(graph=GRAPH, model_layers=101, kernel_size=3, pad=False,
                   trans_dropout=0.0, **kwargs).eval()
    x = _input()
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x))
    ref_logits = (ref_out[0] if isinstance(ref_out, tuple)
                  else ref_out).numpy()

    adj = build_adjacency("ntu_rgb_d")
    model = AAGCNv17(adj=adj, model_layers=101, kernel_size=3, pad=False,
                     trans_dropout=0.0, **kwargs)
    variables = aagcn_v17_variables_from_torch(ref.state_dict())
    ours, _ = model.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(ours), ref_logits, atol=1e-3,
                               rtol=1e-3)


@pytest.mark.parametrize("gcn_unit", ["v2", "v3"])
def test_v30_parity(gcn_unit):
    add_reference_to_path()
    import torch
    from model.architecture.aagcn.aagcn_v30 import Model as TorchV30

    cfg = {"num_heads": 2, "model_dim": 16, "ffn_dim": 64, "dropout": 0.0,
           "activation": "gelu", "prenorm": False, "num_layers": 2}
    torch.manual_seed(0)
    ref = TorchV30(graph=GRAPH, model_layers=101,
                   t_trans_cfg=dict(cfg), s_trans_cfg=dict(cfg),
                   kernel_size=3, pad=False, pos_enc="cossin",
                   gcn_trans_unit=gcn_unit).eval()
    x = _input()
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x))
    ref_logits = (ref_out[0] if isinstance(ref_out, tuple)
                  else ref_out).numpy()

    adj = build_adjacency("ntu_rgb_d")
    model = AAGCNv30(adj=adj, model_layers=101, kernel_size=3, pad=False,
                     backbone_dim=16, t_model_dim=16, t_ffn_dim=64,
                     t_dropout=0.0, num_layers=2, pos_enc="cossin",
                     gcn_trans_unit=gcn_unit)
    variables = aagcn_v30_variables_from_torch(ref.state_dict())
    ours, _ = model.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(ours), ref_logits, atol=1e-3,
                               rtol=1e-3)


@pytest.mark.parametrize("kwargs", [
    dict(trans_seq="s-t"),
    # t-s requires the CLS slot (the reference's x0 slice eats a real
    # token and crashes on the reshape without it, aagcn_v31.py:440-442)
    dict(trans_seq="t-s"),
    dict(trans_seq="sa-t", add_A=True),
    dict(trans_seq="sa-t-res", add_A=True, add_Aa=True,
         res_dropout=0.0, multi_trans_dropout=0.0),
])
def test_v31_parity(kwargs):
    add_reference_to_path()
    import torch
    from model.architecture.aagcn.aagcn_v31 import Model as TorchV31
    from agcn_tpu.models.aagcn_versions import AAGCNv31
    from agcn_tpu.utils.torch_import import aagcn_v31_variables_from_torch

    cfg = {"num_heads": 2, "model_dim": 16, "ffn_dim": 64, "dropout": 0.0,
           "activation": "gelu", "prenorm": False, "num_layers": 2}
    torch.manual_seed(0)
    ref = TorchV31(graph=GRAPH, model_layers=101,
                   t_trans_cfg=dict(cfg), s_trans_cfg=dict(cfg),
                   kernel_size=3, pad=False, pos_enc="cossin",
                   **kwargs).eval()
    # reference hardcodes the spatial token width to 100 frames
    # (aagcn_v31.py: s model_dim * 100), so T must be 300 with k=3
    x = _input(t=300)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x))
    ref_logits = (ref_out[0] if isinstance(ref_out, tuple)
                  else ref_out).numpy()

    adj = build_adjacency("ntu_rgb_d")
    model = AAGCNv31(adj=adj, model_layers=101, kernel_size=3, pad=False,
                     backbone_dim=16, t_model_dim=16, t_ffn_dim=64,
                     s_model_dim=16, s_ffn_dim=64, dropout=0.0,
                     num_layers=2, pos_enc="cossin", **kwargs)
    variables = aagcn_v31_variables_from_torch(ref.state_dict())
    ours, _ = model.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(ours), ref_logits, atol=1e-3,
                               rtol=1e-3)


@pytest.mark.parametrize("kwargs", [
    dict(trans_seq="sa-t", add_A=True),
    dict(trans_seq="sa-t-attn-a", add_A=True),
    dict(trans_seq="sa-t-res", add_A=True,
         res_dropout=0.0, multi_trans_dropout=0.0),
    dict(trans_seq="sa-t-res-attn-a", add_A=True,
         res_dropout=0.0, multi_trans_dropout=0.0),
])
def test_v32_parity(kwargs):
    """v32 = v31 with per-layer alphas and the post-softmax attention
    injection ('attn-a') modes (aagcn_v32.py:362-490)."""
    add_reference_to_path()
    import torch
    from model.architecture.aagcn.aagcn_v32 import Model as TorchV32
    from agcn_tpu.models.aagcn_versions import AAGCNv31
    from agcn_tpu.utils.torch_import import aagcn_v31_variables_from_torch

    cfg = {"num_heads": 2, "model_dim": 16, "ffn_dim": 64, "dropout": 0.0,
           "activation": "gelu", "prenorm": False, "num_layers": 2}
    torch.manual_seed(0)
    ref = TorchV32(graph=GRAPH, model_layers=101,
                   t_trans_cfg=dict(cfg), s_trans_cfg=dict(cfg),
                   kernel_size=3, pad=False, pos_enc="cossin",
                   **kwargs).eval()
    # make the zero-init alphas non-trivial so the masked paths are
    # actually exercised
    with torch.no_grad():
        for layers in ref.s_trans_enc_layers:
            for _, sl in layers.items():
                sl.alpha.fill_(0.3)
    x = _input(t=300)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x))
    ref_logits = (ref_out[0] if isinstance(ref_out, tuple)
                  else ref_out).numpy()

    adj = build_adjacency("ntu_rgb_d")
    model = AAGCNv31(adj=adj, model_layers=101, kernel_size=3, pad=False,
                     backbone_dim=16, t_model_dim=16, t_ffn_dim=64,
                     s_model_dim=16, s_ffn_dim=64, dropout=0.0,
                     num_layers=2, pos_enc="cossin", version="v32",
                     **kwargs)
    variables = aagcn_v31_variables_from_torch(ref.state_dict())
    ours, _ = model.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(ours), ref_logits, atol=1e-3,
                               rtol=1e-3)


@pytest.mark.parametrize("kwargs", [
    dict(add_A="False", classifier_type="CLS"),
    dict(add_A="single", classifier_type="CLS"),
    dict(add_A="triple", classifier_type="CLS"),
    dict(add_A="single", classifier_type="CLS_MASK"),
])
def test_v24_parity(kwargs):
    """v24: per-frame spatial transformer with block-diag PA masks and
    (bug-compatible) CLS_MASK readout (aagcn_v24.py:176-320)."""
    add_reference_to_path()
    import torch
    from model.architecture.aagcn.aagcn_v24 import Model as TorchV24
    from agcn_tpu.models.aagcn_versions import AAGCNv24
    from agcn_tpu.utils.torch_import import aagcn_v24_variables_from_torch

    cfg = {"num_heads": 3, "model_dim": 24, "ffn_dim": 96, "dropout": 0.0,
           "activation": "gelu", "prenorm": False, "num_layers": 2}
    torch.manual_seed(0)
    ref = TorchV24(graph=GRAPH, model_layers=101,
                   s_trans_cfg=dict(cfg), kernel_size=3, pad=False,
                   pos_enc="cossin", **kwargs).eval()
    with torch.no_grad():
        ref.alpha.fill_(0.2)
    x = _input(t=60)
    if kwargs["classifier_type"] == "CLS_MASK":
        x[:, :, 48:] = 0.0  # some empty frames so the mask path matters
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x))
    ref_logits = (ref_out[0] if isinstance(ref_out, tuple)
                  else ref_out).numpy()

    adj = build_adjacency("ntu_rgb_d")
    model = AAGCNv24(adj=adj, model_layers=101, kernel_size=3, pad=False,
                     s_num_heads=3, s_model_dim=24, s_ffn_dim=96,
                     dropout=0.0, num_layers=2, pos_enc="cossin",
                     **kwargs)
    variables = aagcn_v24_variables_from_torch(ref.state_dict())
    ours, _ = model.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(ours), ref_logits, atol=1e-3,
                               rtol=1e-3)


@pytest.mark.parametrize("kwargs", [
    dict(trans_seq="s-t", classifier_type="GAP"),
    dict(trans_seq="t-s", classifier_type="CLS-POOL"),
    dict(trans_seq="s-t-v2", classifier_type="CLS"),
    dict(trans_seq="sa-t-v2", add_A=True, add_Aa="True",
         classifier_type="CLS"),
    # the reference's rel-pos skew requires seq len == table length, so
    # rel modes need the CLS slot to reach t_length=101
    dict(trans_seq="sa-t-res-v3", add_A=True, add_Aa="one",
         res_dropout=0.0, multi_trans_dropout=0.0,
         classifier_type="CLS"),
])
def test_v34_parity(kwargs):
    """v34: per-person temporal/spatial interleave, plain vs forked MHA
    with shared relative position bias, v3's replace-and-norm spatial
    step (aagcn_v34.py:198-524)."""
    add_reference_to_path()
    import torch
    from model.architecture.aagcn.aagcn_v34 import Model as TorchV34
    from agcn_tpu.models.aagcn_versions import AAGCNv34
    from agcn_tpu.utils.torch_import import aagcn_v34_variables_from_torch

    t_cfg = {"num_heads": 2, "model_dim": 16, "ffn_dim": 64,
             "dropout": 0.0, "activation": "gelu", "prenorm": False,
             "num_layers": 2, "pos_emb": "rel-shared", "length": 101}
    s_cfg = dict(t_cfg, length=25)
    torch.manual_seed(0)
    ref = TorchV34(graph=GRAPH, model_layers=101,
                   t_trans_cfg=dict(t_cfg), s_trans_cfg=dict(s_cfg),
                   kernel_size=3, pad=False, pos_enc="cossin",
                   backbone_dim=16, trans_len=100, **kwargs).eval()
    if kwargs.get("add_Aa") == "True":
        with torch.no_grad():  # exercise the alpha path
            for layers in ref.s_trans_enc_layers:
                for nme, sl in layers.items():
                    if hasattr(sl, "alpha") and sl.alpha is not None:
                        sl.alpha.fill_(0.25)
    x = _input(t=300)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x))
    ref_logits = (ref_out[0] if isinstance(ref_out, tuple)
                  else ref_out).numpy()

    adj = build_adjacency("ntu_rgb_d")
    model = AAGCNv34(adj=adj, model_layers=101, kernel_size=3, pad=False,
                     backbone_dim=16, trans_len=100,
                     t_model_dim=16, t_ffn_dim=64, t_length=101,
                     s_model_dim=16, s_ffn_dim=64, s_length=25,
                     dropout=0.0, num_layers=2, pos_enc="cossin",
                     **kwargs)
    variables = aagcn_v34_variables_from_torch(ref.state_dict())
    ours, _ = model.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(ours), ref_logits, atol=1e-3,
                               rtol=1e-3)


def test_v17_train_mode_runs():
    adj = build_adjacency("ntu_rgb_d")
    model = AAGCNv17(adj=adj, model_layers=101, kernel_size=3, pad=False,
                     num_class=7)
    x = jnp.asarray(_input(t=30))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    (logits, _), _ = model.apply(variables, x, train=True,
                                 mutable=["batch_stats"],
                                 rngs={"dropout": jax.random.PRNGKey(1)})
    assert logits.shape == (2, 7)
    assert np.isfinite(np.asarray(logits)).all()


def test_broken_versions_documented():
    """v29/v37 cannot construct in the mounted reference — the basis for
    not shipping per-version parity for them (aagcn_versions.py
    docstring). If the reference is ever fixed, this test fails and the
    parity work should be revisited."""
    add_reference_to_path()
    from model.architecture.aagcn.aagcn_v29 import Model as V29
    from model.architecture.aagcn.aagcn_v37 import Model as V37

    cfg = {"num_heads": 2, "model_dim": 16, "ffn_dim": 64, "dropout": 0.0,
           "activation": "gelu", "prenorm": False, "num_layers": 1}
    with pytest.raises(NameError):
        V29(graph=GRAPH, model_layers=101, t_trans_cfg=dict(cfg),
            s_trans_cfg=dict(cfg), kernel_size=3, pad=False)
    v37_t = {"dim": 800, "depth": 1, "heads": 25, "dim_head": 16,
             "mlp_dim": 3200, "dropout": 0.0, "pos_emb": "rel-shared",
             "length": 101, "num_layers": 1}
    v37_s = {"dim": 3200, "depth": 1, "heads": 1, "dim_head": 416,
             "mlp_dim": 12800, "dropout": 0.0, "pos_emb": "rel-shared",
             "length": 26, "num_layers": 1}
    v37_c = {"depth": 1, "sm_dim": 800, "sm_heads": 16, "sm_dim_head": 50,
             "sm_dropout": 0.0, "lg_dim": 3200, "lg_heads": 1,
             "lg_dim_head": 3200, "lg_dropout": 0.0, "num_layers": 1}
    with pytest.raises(RuntimeError, match="negative dimension"):
        V37(graph=GRAPH, model_layers=101, t_trans_cfg=v37_t,
            s_trans_cfg=v37_s, c_trans_cfg=v37_c, kernel_size=3,
            pad=False, pos_enc=None)

    # v33: CLS repeated per sample vs per-person tokens -> concat crash;
    # v35: rel tables sized `length` vs 2x-long sequences -> skew crash
    import torch
    from model.architecture.aagcn.aagcn_v33 import Model as V33
    from model.architecture.aagcn.aagcn_v35 import Model as V35

    rel = {"num_heads": 2, "model_dim": 16, "ffn_dim": 64, "dropout": 0.0,
           "activation": "gelu", "prenorm": False, "num_layers": 2,
           "pos_emb": "rel-shared", "length": 101}
    m33 = V33(graph=GRAPH, model_layers=101, kernel_size=3, pad=False,
              t_trans_cfg=dict(rel, length=201), s_trans_cfg=dict(rel))
    with pytest.raises(RuntimeError):
        m33(torch.ones(2, 3, 300, 25, 2))
    m35 = V35(graph=GRAPH, model_layers=101, kernel_size=3, pad=False,
              t_trans_cfg=dict(rel), s_trans_cfg=dict(rel, length=25),
              trans_seq="v0-t-s")
    with pytest.raises(RuntimeError):
        m35(torch.ones(2, 3, 300, 25, 2))
