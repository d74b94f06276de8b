"""Visualization (matplotlib; reference uses open3d/mayavi viewers,
detector3d/tools/visual_utils/). Headless-friendly: everything renders to
arrays/PNGs."""
from __future__ import annotations

import numpy as np


def _boxes_bev_corners(boxes):
    import jax.numpy as jnp

    from ..geom.boxes import corners_bev

    return np.asarray(corners_bev(jnp.asarray(np.asarray(boxes)[:, :7],
                                              dtype=jnp.float32)))


def draw_bev(ax, points, boxes=None, scores=None, gt_boxes=None,
             completed=None, point_size=0.3):
    """Scatter a frame + rotated boxes on a matplotlib axis."""
    ax.scatter(points[:, 0], points[:, 1], s=point_size, c="#808080",
               linewidths=0)
    if completed is not None and len(completed):
        ax.scatter(completed[:, 0], completed[:, 1], s=2 * point_size,
                   c="#cc3311", linewidths=0, label="completed")
    for bset, color in ((gt_boxes, "#009988"), (boxes, "#0077bb")):
        if bset is None or len(bset) == 0:
            continue
        for i, c in enumerate(_boxes_bev_corners(bset)):
            poly = np.vstack([c, c[:1]])
            ax.plot(poly[:, 0], poly[:, 1], "-", c=color, lw=1.2)
            if bset is boxes and scores is not None:
                ax.text(c[0, 0], c[0, 1], f"{scores[i]:.2f}", fontsize=7,
                        color=color)
    ax.set_aspect("equal")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")


def save_bev(path, points, boxes=None, scores=None, gt_boxes=None,
             completed=None, figsize=(10, 10), dpi=150):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=figsize)
    draw_bev(ax, points, boxes, scores, gt_boxes, completed)
    fig.savefig(path, dpi=dpi, bbox_inches="tight")
    plt.close(fig)
    return path


def scatter_3d(path, points, boxes=None, figsize=(10, 8), dpi=150,
               max_points=30000):
    """3D scatter + box wireframes (open3d viewer stand-in)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..geom.boxes import boxes_to_corners_3d
    import jax.numpy as jnp

    fig = plt.figure(figsize=figsize)
    ax = fig.add_subplot(projection="3d")
    p = np.asarray(points)
    if len(p) > max_points:
        p = p[np.random.default_rng(0).choice(len(p), max_points, replace=False)]
    ax.scatter(p[:, 0], p[:, 1], p[:, 2], s=0.2, c=p[:, 2], cmap="viridis")
    if boxes is not None and len(boxes):
        corners = np.asarray(boxes_to_corners_3d(
            jnp.asarray(np.asarray(boxes)[:, :7], jnp.float32)))
        edges = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7),
                 (7, 4), (0, 4), (1, 5), (2, 6), (3, 7)]
        for c in corners:
            for a, b in edges:
                ax.plot(*zip(c[a], c[b]), c="#0077bb", lw=1.0)
    fig.savefig(path, dpi=dpi, bbox_inches="tight")
    plt.close(fig)
    return path
