"""Skeleton visualization.

Parity target: reference utils/visualization.py
(visualize_3dskeleton_in_matplotlib[_step]): 2D/3D matplotlib animation of
(N, C, T, V, M) sequences. Import of matplotlib is deferred so headless
training hosts never pay for it.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from agcn_tpu.graph import get_skeleton


def visualize_skeleton(data: np.ndarray,
                       skeleton_name: str = "ntu_rgb_d",
                       is_3d: bool = True,
                       sample: int = 0,
                       interval_ms: int = 50,
                       save_path: Optional[str] = None):
    """Animate one (N, C, T, V, M) sample's skeleton sequence.

    Returns the matplotlib FuncAnimation (caller keeps a reference or
    passes save_path to write a gif/mp4).
    """
    import matplotlib
    if save_path:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import animation

    sk = get_skeleton(skeleton_name)
    edges = sk.neighbor
    x = np.asarray(data[sample])  # (C, T, V, M)
    c, t, v, m = x.shape

    fig = plt.figure()
    if is_3d and c >= 3:
        ax = fig.add_subplot(projection="3d")
    else:
        ax = fig.add_subplot()
    lines = []
    for _ in range(m * len(edges)):
        (ln,) = ax.plot([], [], [], "o-", markersize=2) if is_3d \
            else ax.plot([], [], "o-", markersize=2)
        lines.append(ln)

    lim = np.abs(x).max() or 1.0
    ax.set_xlim(-lim, lim)
    ax.set_ylim(-lim, lim)
    if is_3d:
        ax.set_zlim(-lim, lim)

    def update(frame):
        idx = 0
        for p in range(m):
            for (i, j) in edges:
                xs = [x[0, frame, i, p], x[0, frame, j, p]]
                ys = [x[1, frame, i, p], x[1, frame, j, p]]
                lines[idx].set_data(xs, ys)
                if is_3d:
                    lines[idx].set_3d_properties(
                        [x[2, frame, i, p], x[2, frame, j, p]])
                idx += 1
        return lines

    anim = animation.FuncAnimation(fig, update, frames=t,
                                   interval=interval_ms, blit=False)
    if save_path:
        anim.save(save_path)
        plt.close(fig)
    return anim


def plot_attention(g: np.ndarray, save_path: Optional[str] = None,
                   title: str = "G"):
    """Heatmap of a (V, V) or (T, V, V) attention matrix (the reference
    demo's live G-matrix plot, infer/inference_220802.py:518-560)."""
    import matplotlib
    if save_path:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    g = np.asarray(g)
    if g.ndim == 3:      # per-frame attention -> average over frames
        g = g.mean(axis=0)
    fig, ax = plt.subplots()
    im = ax.imshow(g, cmap="viridis")
    ax.set_title(title)
    ax.set_xlabel("destination joint")
    ax.set_ylabel("source joint")
    fig.colorbar(im)
    if save_path:
        fig.savefig(save_path, dpi=150, bbox_inches="tight")
        plt.close(fig)
    return fig
