"""SGN tests: shapes across config space + parity vs reference sgn_v14."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agcn_tpu.models.sgn import SGN
from agcn_tpu.utils.torch_import import sgn_variables_from_torch

from .conftest import add_reference_to_path, reference_available


def seg_inputs(n=4, t=20, v=25, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, t, v * c)).astype(np.float32)


@pytest.mark.parametrize("kwargs", [
    dict(),
    dict(sgcn_gt_mode=0),
    dict(semantic_joint_fusion=1),
    dict(semantic_frame_location=1),
    dict(multi_t=((), (), (3, 5, 7))),
    dict(t_mode=2, sgcn_residual=(1, 1, 1)),
    dict(sgcn_prenorm=True, sgcn_ffn=4.0),
    dict(input_position=2, input_velocity=11),
    dict(semantic_frame=0, semantic_joint=0, semantic_joint_fusion=1),
    dict(sgcn_g_proj_dim=(256, 256, 256)),
])
def test_forward_configs(kwargs):
    model = SGN(num_class=13, **kwargs)
    x = jnp.asarray(seg_inputs())
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    logits, aux = model.apply(variables, x, train=False)
    assert logits.shape == (4, 13)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_train_mode_with_dropout():
    model = SGN(num_class=7, dropout=0.1, dropout2d=0.2, sgcn_dropout=0.1)
    x = jnp.asarray(seg_inputs())
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    logits, _ = model.apply(variables, x, train=True,
                            mutable=["batch_stats"],
                            rngs={"dropout": jax.random.PRNGKey(1)})[0]
    assert np.all(np.isfinite(np.asarray(logits)))


V14_KWARGS = dict(
    num_class=60, num_point=25, num_segment=20, in_channels=3, bias=1,
    dropout=0.0, dropout2d=0.2, c_multiplier=[1.0, 1.0, 1.0, 1.0],
    norm_type="bn", act_type="relu", xem_projection=0, input_position=1,
    input_velocity=1, semantic_joint=1, semantic_frame=1, semantic_class=0,
    semantic_joint_fusion=0, semantic_frame_fusion=1,
    semantic_frame_location=0, sgcn_dims=[128, 256, 256], sgcn_kernel=1,
    sgcn_padding=0, sgcn_dropout=0.0, sgcn_residual=[0, 0, 0],
    sgcn_prenorm=False, sgcn_g_kernel=1, sgcn_g_proj_dim=256,
    sgcn_g_proj_shared=False, gcn_fpn=-1, spatial_maxpool=1,
    temporal_maxpool=1, multi_t=[[], [], [3]], t_mode=1,
)


def _torch_sgn(**overrides):
    add_reference_to_path()
    import torch
    from model.architecture.sgn.sgn_v14 import SGN as TorchSGN

    torch.manual_seed(0)
    kwargs = {**V14_KWARGS, **overrides}
    return TorchSGN(**kwargs)


def _ours_from(kwargs):
    return SGN(
        num_class=kwargs["num_class"], num_point=kwargs["num_point"],
        num_segment=kwargs["num_segment"], in_channels=kwargs["in_channels"],
        use_bias=bool(kwargs["bias"]), dropout=kwargs["dropout"],
        dropout2d=kwargs["dropout2d"],
        input_position=kwargs["input_position"],
        input_velocity=kwargs["input_velocity"],
        semantic_joint=kwargs["semantic_joint"],
        semantic_frame=kwargs["semantic_frame"],
        semantic_class=kwargs["semantic_class"],
        semantic_joint_fusion=kwargs["semantic_joint_fusion"],
        semantic_frame_location=kwargs["semantic_frame_location"],
        sgcn_dims=tuple(kwargs["sgcn_dims"]),
        sgcn_residual=tuple(kwargs["sgcn_residual"]),
        sgcn_prenorm=kwargs["sgcn_prenorm"],
        sgcn_ffn=kwargs.get("sgcn_ffn"),
        sgcn_g_proj_dim=tuple(kwargs["sgcn_g_proj_dim"])
        if isinstance(kwargs["sgcn_g_proj_dim"], list)
        else kwargs["sgcn_g_proj_dim"],
        sgcn_g_proj_shared=kwargs["sgcn_g_proj_shared"],
        sgcn_kernel=kwargs.get("sgcn_kernel", 1),
        sgcn_padding=kwargs.get("sgcn_padding", 0),
        sgcn_g_kernel=kwargs.get("sgcn_g_kernel", 1),
        sgcn_v_kernel=kwargs.get("sgcn_v_kernel", 0),
        sgcn_g_res_alpha=kwargs.get("sgcn_g_res_alpha", 1.0),
        sgcn_gt_mode=kwargs.get("sgcn_gt_mode", 1),
        sgcn_gt_act=kwargs.get("sgcn_gt_act", 1),
        sgcn_gt_g3_idx=kwargs.get("sgcn_gt_g3_idx", 2),
        sgcn_gt_out_channels2=kwargs.get("sgcn_gt_out_channels2", 512),
        spatial_maxpool=kwargs["spatial_maxpool"],
        temporal_maxpool=kwargs["temporal_maxpool"],
        multi_t=tuple(tuple(t) for t in kwargs["multi_t"]),
        multi_t_shared=kwargs.get("multi_t_shared", 0),
        t_mode=kwargs["t_mode"],
    )


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
@pytest.mark.parametrize("overrides", [
    dict(),                     # shipped train_sgn_v14.yaml (gt_mode 1)
    dict(sgcn_gt_mode=0),       # original-SGN G attention
    dict(multi_t=[[], [], [3, 5, 7]]),
    dict(sgcn_g_proj_dim=[256, 256, 256]),   # per-layer G
    dict(multi_t=[[3], [3], [3]], multi_t_shared=2),
    dict(sgcn_gt_mode=2),
    dict(sgcn_gt_mode=3),
    dict(sgcn_gt_mode=4, sgcn_gt_act=2),
    dict(sgcn_gt_mode=5),
    dict(sgcn_gt_mode=5, sgcn_gt_g3_idx=3),
    dict(sgcn_gt_mode=6, multi_t=[[], [], [3], [3]]),
    # learnable res_alpha ("varalpha"; the ledger-best v13 recipe
    # 220915120001_gt4_varalpha_sigmoid_multit357, readme.yaml:555-556)
    dict(sgcn_g_res_alpha=-1, sgcn_gt_mode=4, sgcn_gt_act=2,
         multi_t=[[], [], [3, 5, 7]]),
    dict(sgcn_g_res_alpha=-2),  # zero-init learnable variant
    dict(sgcn_kernel=3, sgcn_padding=1, sgcn_g_kernel=3),
    dict(sgcn_v_kernel=3),
    dict(sgcn_ffn=104.0),   # post-norm conv FFN
    dict(sgcn_ffn=204.0),   # "Linear" FFN == 1x1 conv pre-norm
    dict(sgcn_ffn=304.0),   # "Linear" FFN post-norm
])
def test_parity_vs_torch_reference(overrides):
    import torch

    kwargs = {**V14_KWARGS, **overrides}
    ref = _torch_sgn(**overrides).eval()
    if overrides.get("sgcn_g_res_alpha", 1.0) < 0:
        # the learnable alphas init to 1.0/0.0 — perturb them so the
        # transplant proves the parameter is actually consumed
        with torch.no_grad():
            for i, a in enumerate((0.7, 1.3, -0.2)):
                getattr(ref.sgcn, f"gcn{i + 1}").res_alpha.fill_(a)
    x_np = seg_inputs()
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x_np))
    ref_logits = ref_out[0].numpy()

    model = _ours_from(kwargs)
    variables = sgn_variables_from_torch(ref.state_dict())
    ours, _ = model.apply(variables, jnp.asarray(x_np), train=False)
    np.testing.assert_allclose(np.asarray(ours), ref_logits,
                               atol=3e-4, rtol=3e-4)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_parity_output_merge2():
    """gcn_fpn_output_merge=2: per-branch fc heads, logits averaged
    (sgn_v14.py:798-803, :1026-1034). The reference over-allocates unused
    fc heads, so transplant goes through the tolerant merge."""
    import torch

    from agcn_tpu.train.checkpoint import merge_params

    overrides = dict(multi_t=[[], [], [3, 5]], gcn_fpn_output_merge=2)
    kwargs = {**V14_KWARGS, **overrides}
    ref = _torch_sgn(**overrides).eval()
    x_np = seg_inputs()
    with torch.no_grad():
        ref_logits = ref(torch.from_numpy(x_np))[0].numpy()

    model = SGN(
        num_class=kwargs["num_class"], use_bias=bool(kwargs["bias"]),
        multi_t=((), (), (3, 5)), gcn_fpn_output_merge=2,
        dropout2d=kwargs["dropout2d"])
    base = model.init(jax.random.PRNGKey(0), jnp.asarray(x_np),
                      train=False)
    loaded = sgn_variables_from_torch(ref.state_dict())
    variables = {
        "params": merge_params(base["params"], loaded["params"]),
        "batch_stats": merge_params(base.get("batch_stats", {}),
                                    loaded.get("batch_stats", {})),
    }
    ours, _ = model.apply(variables, jnp.asarray(x_np), train=False)
    np.testing.assert_allclose(np.asarray(ours), ref_logits,
                               atol=3e-4, rtol=3e-4)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_parity_output_merge2_single_branch():
    """merge mode 2 with ONE temporal branch still routes through fc1,
    not fc — the reference keeps the list under merge==2 regardless of
    its length (sgn_v14.py:996-999,1026-1034), so gating on branch count
    would leave transplanted fc1 weights unused."""
    import torch

    from agcn_tpu.train.checkpoint import merge_params

    overrides = dict(multi_t=[[], [], [3]], gcn_fpn_output_merge=2)
    kwargs = {**V14_KWARGS, **overrides}
    ref = _torch_sgn(**overrides).eval()
    x_np = seg_inputs()
    with torch.no_grad():
        ref_logits = ref(torch.from_numpy(x_np))[0].numpy()

    model = SGN(
        num_class=kwargs["num_class"], use_bias=bool(kwargs["bias"]),
        multi_t=((), (), (3,)), gcn_fpn_output_merge=2,
        dropout2d=kwargs["dropout2d"])
    base = model.init(jax.random.PRNGKey(0), jnp.asarray(x_np),
                      train=False)
    assert "fc1" in base["params"] and "fc" not in base["params"]
    loaded = sgn_variables_from_torch(ref.state_dict())
    variables = {
        "params": merge_params(base["params"], loaded["params"]),
        "batch_stats": merge_params(base.get("batch_stats", {}),
                                    loaded.get("batch_stats", {})),
    }
    ours, _ = model.apply(variables, jnp.asarray(x_np), train=False)
    np.testing.assert_allclose(np.asarray(ours), ref_logits,
                               atol=3e-4, rtol=3e-4)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
@pytest.mark.parametrize("attn2", [0, 10])
def test_parity_gcn_fpn10_second_stack(attn2):
    """gcn_fpn=10: the second GCN stack (GCNSpatialBlock2) with reused
    G, injected high-to-low levels (used only by attn_mode 10), and the
    sgcn2.* checkpoint mapping."""
    import torch

    # sgcn2_g_proj_dim must be given or the reference's Block2 ctor
    # crashes on None (spatial.py:1073-1075); the resulting gcn_g modules
    # are dead (forward always passes g_attn)
    overrides = dict(gcn_fpn=10, sgcn2_dims=[256, 256, 256],
                     sgcn2_attn_mode=attn2, sgcn2_g_proj_dim=256)
    kwargs = {**V14_KWARGS, **overrides}
    ref = _torch_sgn(**overrides).eval()
    x_np = seg_inputs()
    with torch.no_grad():
        ref_logits = ref(torch.from_numpy(x_np))[0].numpy()

    model = SGN(
        num_class=kwargs["num_class"], use_bias=bool(kwargs["bias"]),
        dropout2d=kwargs["dropout2d"], gcn_fpn=10,
        sgcn2_dims=(256, 256, 256), sgcn2_attn_mode=attn2)
    variables = sgn_variables_from_torch(ref.state_dict())
    ours, _ = model.apply(variables, jnp.asarray(x_np), train=False)
    np.testing.assert_allclose(np.asarray(ours), ref_logits,
                               atol=3e-4, rtol=3e-4)


def test_gcn_fpn_shared_projection():
    """gcn_fpn_shared=1 shares ONE fpn projection across levels
    (sgn_v14.py:449-458); like the reference's fixed-in-channels Conv it
    requires equal level widths."""
    m = SGN(num_class=5, gcn_fpn=1, gcn_fpn_shared=1,
            sgcn_dims=(64, 64, 64), multi_t=((3,), (3,), (3,)))
    x = jnp.asarray(seg_inputs())
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    assert "fpn_proj1" in v["params"] and "fpn_proj2" not in v["params"]
    out, _ = m.apply(v, x, train=False)
    assert out.shape == (4, 5)
