"""Op-library unit tests: aggregation semantics, attention axes, fused
static operator equivalence."""

import jax
import jax.numpy as jnp
import numpy as np

from agcn_tpu.graph import build_adjacency
from agcn_tpu.ops import (aggregate, apply_fused_static, embedding_attention,
                          frame_aggregate, frame_attention,
                          fused_static_operator)


def test_aggregate_matches_manual():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4, 25, 8)).astype(np.float32))
    a = jnp.asarray(build_adjacency("ntu_rgb_d")[1])
    out = aggregate(x, a)
    ref = np.einsum("btvc,vw->btwc", np.asarray(x), np.asarray(a))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_embedding_attention_normalizes_source_axis():
    rng = np.random.default_rng(0)
    th = jnp.asarray(rng.standard_normal((2, 4, 25, 8)).astype(np.float32))
    ph = jnp.asarray(rng.standard_normal((2, 4, 25, 8)).astype(np.float32))
    att = embedding_attention(th, ph)
    assert att.shape == (2, 25, 25)
    # softmax over the SOURCE axis (reference agcn.py:101, dim=-2):
    # each destination column sums to 1
    np.testing.assert_allclose(np.asarray(att).sum(axis=-2), 1.0,
                               atol=1e-5)


def test_frame_attention_and_aggregate():
    rng = np.random.default_rng(0)
    g1 = jnp.asarray(rng.standard_normal((2, 4, 25, 8)).astype(np.float32))
    g2 = jnp.asarray(rng.standard_normal((2, 4, 25, 8)).astype(np.float32))
    g = frame_attention(g1, g2)
    # softmax over the last axis (SGN convention, spatial.py:237)
    np.testing.assert_allclose(np.asarray(g).sum(axis=-1), 1.0, atol=1e-5)
    x = jnp.asarray(rng.standard_normal((2, 4, 25, 8)).astype(np.float32))
    out = frame_aggregate(x, g)
    ref = np.einsum("btvw,btwc->btvc", np.asarray(g), np.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_fused_static_operator_equivalence():
    rng = np.random.default_rng(0)
    adj = jnp.asarray(build_adjacency("ntu_rgb_d"))
    x = jnp.asarray(rng.standard_normal((2, 4, 25, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 8, 16)).astype(np.float32))
    op = fused_static_operator(adj, w)
    out = apply_fused_static(x, op, 25)
    ref = sum(np.einsum("btvc,vw->btwc", np.asarray(x),
                        np.asarray(adj[k])) @ np.asarray(w[k])
              for k in range(3))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_attention_logits_forms_agree():
    """All attention_logits formulations are numerically equivalent
    (ops/gcn.attention_logits; semantics: reference agcn.py:99-101)."""
    import jax.numpy as jnp
    import numpy as np

    from agcn_tpu.ops import gcn as gcn_ops

    rng = np.random.default_rng(3)
    b, t, v, k, ce = 2, 12, 25, 3, 8
    emb = jnp.asarray(rng.standard_normal((b, t, v, 2 * k * ce)),
                      jnp.float32)
    ref = gcn_ops.attention_logits(emb, k, ce, "naive")
    for form in ("transposed", "transposed_tl", "onepack", "blockdiag"):
        got = gcn_ops.attention_logits(emb, k, ce, form)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5, err_msg=form)


def test_gcn_formulations_agree():
    """All apply_gcn formulations match the reference aggregate-project."""
    import jax.numpy as jnp
    import numpy as np

    from agcn_tpu.ops import gcn as gcn_ops

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 8, 25, 16)), jnp.float32)
    a1 = jnp.asarray(rng.standard_normal((2, 3, 25, 25)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 16, 10)), jnp.float32)
    ref = gcn_ops.apply_gcn(x, a1, w, "agg")
    for form in ("pf", "custom", "pf_packed", "agg_packed", "agg_packed2",
                 "agg_dp", "fused_dyn", "hybrid"):
        got = gcn_ops.apply_gcn(x, a1, w, form)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-3, rtol=1e-4, err_msg=form)


def test_flops_cost_analysis():
    """XLA cost analysis reports a sane forward FLOP count for AGCN
    (the TPU-native equivalent of the reference's fvcore counting,
    sgn_v13.py:23-27)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from agcn_tpu.graph import build_adjacency
    from agcn_tpu.models import AGCN
    from agcn_tpu.utils.flops import model_flops

    adj = build_adjacency("ntu_rgb_d")
    model = AGCN(num_class=10, adj=adj)
    x = jnp.zeros((2, 3, 16, 25, 2), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    flops, ca = model_flops(model, variables, x)
    # rough analytic floor: the 10 blocks' conv_d projections alone are
    # sum over blocks of 2*B*T*V*(K*C)*Co with B=4 (persons folded)
    assert flops > 1e8, ca
    assert np.isfinite(flops)


def test_agcn_bn_fold_eval_exact():
    """BN folding (utils/bn_fold.py) is exact at eval: folded variables
    reproduce the unfolded logits, and every folded BN is the identity
    affine (a=1, b=0) so XLA erases it from the compiled program."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from agcn_tpu.graph import build_adjacency
    from agcn_tpu.models import AGCN
    from agcn_tpu.utils.bn_fold import fold_agcn_bn_eval

    adj = build_adjacency("ntu_rgb_d")
    model = AGCN(num_class=9, adj=adj)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 3, 16, 25, 2)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    # non-trivial BN stats + scales
    _, upd = model.apply(variables, x, train=True,
                         mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(1)})
    variables = {"params": variables["params"],
                 "batch_stats": upd["batch_stats"]}
    want = model.apply(variables, x, train=False)
    want = np.asarray(want[0] if isinstance(want, tuple) else want)

    folded = fold_agcn_bn_eval(variables)
    got = model.apply(folded, x, train=False)
    got = np.asarray(got[0] if isinstance(got, tuple) else got)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    # with fold_bn=True the compiled eval program SKIPS every block BN
    # (identity_at_eval) — same logits on the folded variables
    fold_model = AGCN(num_class=9, adj=adj, fold_bn=True)
    got2 = fold_model.apply(folded, x, train=False)
    got2 = np.asarray(got2[0] if isinstance(got2, tuple) else got2)
    np.testing.assert_allclose(got2, want, rtol=2e-4, atol=2e-4)

    # folded BNs are the exact identity (rsqrt(var+eps) == 1)
    g = folded["params"]["l1"]["gcn1"]["bn"]
    s = folded["batch_stats"]["l1"]["gcn1"]["bn"]
    assert np.all(g["scale"] == 1.0) and np.all(g["bias"] == 0.0)
    assert np.all(s["mean"] == 0.0)
    np.testing.assert_allclose(
        1.0 / np.sqrt(s["var"] + 1e-5), 1.0, rtol=0, atol=0)


def test_aagcn_bn_fold_eval_exact():
    """AAGCN BN folding: folded variables + fold_bn=True model reproduce
    the unfolded logits (STC attention after the folded BN included)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from agcn_tpu.graph import build_adjacency
    from agcn_tpu.models import AAGCN
    from agcn_tpu.utils.bn_fold import fold_aagcn_bn_eval

    adj = build_adjacency("ntu_rgb_d")
    model = AAGCN(num_class=7, adj=adj, model_layers=6)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 3, 16, 25, 2)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    _, upd = model.apply(variables, x, train=True,
                         mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(1)})
    variables = {"params": variables["params"],
                 "batch_stats": upd["batch_stats"]}
    want, _ = model.apply(variables, x, train=False)

    folded = fold_aagcn_bn_eval(variables)
    fold_model = AAGCN(num_class=7, adj=adj, model_layers=6, fold_bn=True)
    got, _ = fold_model.apply(folded, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_agcn_bn_fold_scan_blocks():
    """BN folding handles scan_blocks checkpoints: scanned groups nest
    under 'block' with a leading stacked axis on every leaf."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from agcn_tpu.graph import build_adjacency
    from agcn_tpu.models import AGCN
    from agcn_tpu.utils.bn_fold import fold_agcn_bn_eval

    adj = build_adjacency("ntu_rgb_d")
    model = AGCN(num_class=5, adj=adj, scan_blocks=True)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 3, 16, 25, 2)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    _, upd = model.apply(variables, x, train=True,
                         mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(1)})
    variables = {"params": variables["params"],
                 "batch_stats": upd["batch_stats"]}
    want = model.apply(variables, x, train=False)
    want = np.asarray(want[0] if isinstance(want, tuple) else want)

    folded = fold_agcn_bn_eval(variables)
    fold_model = AGCN(num_class=5, adj=adj, scan_blocks=True, fold_bn=True)
    got = fold_model.apply(folded, x, train=False)
    got = np.asarray(got[0] if isinstance(got, tuple) else got)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
