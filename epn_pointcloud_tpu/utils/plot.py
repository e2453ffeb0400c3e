"""Visual-verification tooling: EFOV point-cloud dumps and t-SNE feature
plots (rebuild of SPConvNets/utils/plot.py and vgtk/vgtk/pc/plot.py; the
`colour` dependency is replaced by numpy color ramps)."""

from __future__ import annotations

import numpy as np

from ..ops.ply import save_ply


def _ramp(c0, c1, n=1000):
    c0, c1 = np.asarray(c0, np.float64), np.asarray(c1, np.float64)
    t = np.linspace(0, 1, n)[:, None]
    return (1 - t) * c0 + t * c1


RED_BLUE = _ramp((1, 0, 0), (0, 0, 1))
BLACK_RED = _ramp((0, 0, 0), (1, 0, 0))


def clip_to_crange(x, spectrum, xmin, xmax):
    """Map scalars to a color spectrum (ref: plot.py:17-24)."""
    x = np.asarray(x).squeeze()
    cscale = len(spectrum)
    x = ((x - xmin) * cscale / max(xmax - xmin, 1e-12)).astype(np.int64)
    return spectrum[np.clip(x, 0, cscale - 1)]


def visualize_point_efov(xyz, freqs, path):
    """Effective-field-of-view dump: color points by how often they are
    grouped (ref: plot.py:28-41). xyz [b, n, 3]; freqs [b?, a, n] or [n]."""
    freqs = np.asarray(freqs)
    while freqs.ndim > 1:
        freqs = freqs.sum(0)
    xyz = np.asarray(xyz)
    if xyz.ndim == 3:
        xyz = xyz[0]
    color = (255 * clip_to_crange(freqs, BLACK_RED, 0,
                                  float(freqs.max()) + 1)).astype(np.uint8)
    save_ply(path, xyz, colors=color)


def save_colored_cloud(path, xyz, scalars, spectrum=RED_BLUE):
    """Generic scalar-colored .ply dump (ref: vgtk/pc/plot.py)."""
    scalars = np.asarray(scalars, np.float64)
    color = (255 * clip_to_crange(scalars, spectrum, float(scalars.min()),
                                  float(scalars.max()))).astype(np.uint8)
    save_ply(path, np.asarray(xyz), colors=color)


def tsne_plot(feats, labels, path, perplexity: float = 30.0):
    """2-D t-SNE scatter of descriptors colored by label
    (ref: plot.py t-SNE section)."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    from sklearn.manifold import TSNE

    feats = np.asarray(feats)
    labels = np.asarray(labels).reshape(-1)
    emb = TSNE(n_components=2,
               perplexity=min(perplexity, max(2, len(feats) - 1) / 3),
               init='pca', random_state=0).fit_transform(feats)
    fig, ax = plt.subplots(figsize=(8, 8))
    sc = ax.scatter(emb[:, 0], emb[:, 1], c=labels, cmap='tab20', s=6)
    fig.colorbar(sc, ax=ax)
    fig.savefig(path, dpi=150, bbox_inches='tight')
    plt.close(fig)
    return emb
