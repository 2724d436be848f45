"""Inducing-grid construction (host-side NumPy — data-dependent shapes).

Re-design of the reference's ``InducingGrid`` (reference: ``gp_grief/grid.py``
— SURVEY.md §2 #14): build a Cartesian product grid of inducing points from
training data, one 1D point set per dimension.  Per dimension with budget
``mbar``: if the data has ≤ ``mbar`` unique values, use them verbatim (then
on-grid data stays exactly on-grid); otherwise place ``mbar`` points either
equispaced over the (slightly padded) data range or at 1D k-means centers.

This runs once, before training, with data-dependent output shapes — exactly
the kind of code that should stay in host NumPy outside jit (SURVEY.md §7
stage 3).  The resulting per-dimension arrays are static-shaped inputs to the
jitted basis build.  The 1D k-means is a ~15-line Lloyd iteration rather than
an sklearn dependency.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence, Tuple

import numpy as np

__all__ = ["InducingGrid"]


def _kmeans_1d(x: np.ndarray, k: int, iters: int = 25, seed: int = 0) -> np.ndarray:
    """Lloyd's algorithm in 1D with quantile initialization."""
    centers = np.quantile(x, (np.arange(k) + 0.5) / k)
    for _ in range(iters):
        # Assign by nearest center (1D: via sorted boundaries).
        boundaries = (centers[1:] + centers[:-1]) / 2.0
        assign = np.searchsorted(boundaries, x)
        sums = np.bincount(assign, weights=x, minlength=k)
        counts = np.bincount(assign, minlength=k)
        new = np.where(counts > 0, sums / np.maximum(counts, 1), centers)
        if np.allclose(new, centers):
            break
        centers = new
    return np.sort(centers)


@dataclasses.dataclass(frozen=True)
class InducingGrid:
    """Cartesian inducing grid: per-dim point arrays ``xg[d]`` of shape ``(m_d, 1)``.

    Attributes mirror the reference (``grid_shape``, ``grid_dim``, ``xg``,
    ``num_data``, ``input_dim`` — SURVEY.md §2 #14).
    """

    xg: Tuple[np.ndarray, ...]
    grid_shape: Tuple[int, ...]
    input_dim: int
    num_data: int

    @property
    def grid_dim(self) -> int:
        return len(self.xg)

    @property
    def num_virtual(self) -> float:
        """Π m_d as a float (can exceed 10^100 — use logs for exact work)."""
        return float(np.exp(sum(math.log(m) for m in self.grid_shape)))

    @property
    def log10_num_virtual(self) -> float:
        return sum(math.log10(m) for m in self.grid_shape)

    @classmethod
    def build(
        cls,
        x: np.ndarray,
        mbar: int | Sequence[int] = 10,
        eq: bool = True,
        pad: float = 0.05,
        seed: int = 0,
    ) -> "InducingGrid":
        """Construct from data ``x`` of shape ``(n, d)``.

        Args:
          mbar: per-dimension point budget (scalar or one per dimension).
          eq: equispaced placement when the unique values exceed the budget;
            ``False`` selects 1D k-means centers instead (the reference's two
            placement modes).
          pad: relative range padding for equispaced placement.
        """
        x = np.asarray(x, dtype=np.float64)
        if x.ndim == 1:
            x = x[:, None]
        n, d = x.shape
        mbars = [int(mbar)] * d if np.isscalar(mbar) else [int(m) for m in mbar]
        if len(mbars) != d:
            raise ValueError(f"mbar must be scalar or length {d}")
        xg = []
        for dd in range(d):
            col = x[:, dd]
            uniq = np.unique(col)
            if uniq.size <= mbars[dd]:
                pts = uniq
            elif eq:
                lo, hi = col.min(), col.max()
                span = hi - lo
                pts = np.linspace(lo - pad * span, hi + pad * span, mbars[dd])
            else:
                pts = _kmeans_1d(col, mbars[dd], seed=seed)
            xg.append(pts[:, None])
        return cls(
            xg=tuple(xg),
            grid_shape=tuple(int(g.shape[0]) for g in xg),
            input_dim=d,
            num_data=n,
        )
