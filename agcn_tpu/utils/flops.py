"""FLOP counting via XLA cost analysis.

The reference optionally counts FLOPs with fvcore (sgn_v13.py:23-27);
the TPU-native equivalent asks the compiler: every jitted computation
carries an XLA cost analysis with exact flops/bytes for the optimized
HLO (SURVEY.md §5.1).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax


def cost_analysis(fn, *args, **kwargs) -> Dict[str, float]:
    """Compile `fn(*args, **kwargs)` and return XLA's cost analysis
    (keys include 'flops', 'bytes accessed', ...)."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):  # one entry per device program
        ca = ca[0]
    return dict(ca)


def model_flops(model, variables, x, train: bool = False
                ) -> Tuple[float, Dict[str, float]]:
    """Forward-pass FLOPs for a flax model at the given input shape.

    Returns (flops, full_cost_dict). The count reflects the OPTIMIZED
    program (post-fusion, post-constant-folding), so it can differ from
    a paper-napkin count — it is what the hardware actually executes.
    """
    ca = cost_analysis(
        lambda v, x_: model.apply(v, x_, train=train), variables, x)
    return float(ca.get("flops", 0.0)), ca
