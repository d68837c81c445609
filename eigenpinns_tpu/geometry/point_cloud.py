"""Point-cloud Laplacian: a from-scratch replacement for `robust_laplacian`.

The reference leans on the C++ `robust_laplacian` package
(`src/utils.py:172-176`, `src/mesh_helpers.py:62-63`) for
`point_cloud_laplacian(X) -> (L, M)` — a PSD weak Laplacian L and a lumped
diagonal mass M on an unstructured point cloud. That package is not
available here, so this module reimplements the algorithm of
Sharp & Crane, "A Laplacian for Nonmanifold Triangle Meshes" (SGP 2020),
point-cloud variant:

  1. k-nearest neighbors per point (default 30, like robust_laplacian);
  2. PCA tangent plane per point;
  3. 2D Delaunay triangulation of the projected neighborhood;
  4. union of all one-ring triangles -> global triangle soup (deduped);
  5. intrinsic mollification of edge lengths (relative factor 1e-5);
  6. intrinsic cotan stiffness + barycentric lumped mass from the soup.

Host-side numpy/scipy by design: operator assembly is offline
preprocessing (it runs once per hierarchy level); the assembled sparse
operators are then converted to padded-ELL and consumed on-TPU by
`eigenpinns_tpu.sparse`. Step 6 is vectorized over all triangles.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
from scipy.spatial import Delaunay, cKDTree


def _tangent_frames(points: np.ndarray, neigh: np.ndarray):
    """PCA tangent plane per point from its kNN neighborhood.

    Returns (e1, e2): two (N, 3) orthonormal in-plane basis vectors.
    """
    nbr = points[neigh]  # (N, k, 3)
    centered = nbr - nbr.mean(axis=1, keepdims=True)
    # Covariance per point: (N, 3, 3)
    cov = np.einsum("nki,nkj->nij", centered, centered)
    # eigh returns ascending eigenvalues; the two largest span the plane.
    _, vecs = np.linalg.eigh(cov)
    e1 = vecs[:, :, 2]
    e2 = vecs[:, :, 1]
    return e1, e2


def local_triangulations(points: np.ndarray, n_neighbors: int = 30,
                         return_weights: bool = False):
    """One-ring triangles from per-point tangent-plane Delaunay triangulations.

    Returns a deduplicated (T, 3) int array of global vertex triples; with
    ``return_weights=True`` additionally returns per-triangle weights
    ``count/3`` where ``count`` is the number of one-rings that produced the
    triangle. A triangle all three of whose corners agree on it gets weight
    1; spurious triangles seen from a single corner get 1/3. This both
    suppresses outlier connections and normalizes the soup's total area to
    approximately one surface cover (the role played by the tufted-cover
    construction in Sharp & Crane 2020).
    """
    n = points.shape[0]
    k = min(n_neighbors, n - 1)
    tree = cKDTree(points)
    _, neigh = tree.query(points, k=k + 1)  # includes self at column 0
    e1, e2 = _tangent_frames(points, neigh)

    tris = []
    for i in range(n):
        idx = neigh[i]  # local->global map; idx[0] == i
        rel = points[idx] - points[i]
        uv = np.stack([rel @ e1[i], rel @ e2[i]], axis=1)
        try:
            dt = Delaunay(uv)
        except Exception:  # degenerate neighborhoods (collinear projections)
            continue
        simplices = dt.simplices
        # Keep triangles incident to the center point (local index 0).
        ring = simplices[(simplices == 0).any(axis=1)]
        if ring.size:
            tris.append(idx[ring])
    if not tris:
        raise ValueError("no valid local triangulations; degenerate cloud?")
    soup = np.concatenate(tris, axis=0)
    key = np.sort(soup, axis=1)
    _, uniq, counts = np.unique(key, axis=0, return_index=True,
                                return_counts=True)
    order = np.argsort(uniq)
    soup = soup[uniq[order]]
    if not return_weights:
        return soup
    weights = np.minimum(counts[order].astype(np.float64) / 3.0, 1.0)
    return soup, weights


def _intrinsic_mollify(l: np.ndarray, rel_factor: float = 1e-5) -> np.ndarray:
    """Sharp-Crane intrinsic mollification.

    Adds the smallest global epsilon so every triangle satisfies the
    triangle inequality with slack `rel_factor * mean(edge length)`.
    l: (T, 3) edge lengths ordered (l12, l20, l01) opposite corners (0,1,2).
    """
    delta = rel_factor * l.mean()
    # Violation per corner: l_a + l_b - l_c >= delta  =>  eps >= (delta - (la+lb-lc))/...
    viol = np.stack(
        [l[:, 1] + l[:, 2] - l[:, 0],
         l[:, 2] + l[:, 0] - l[:, 1],
         l[:, 0] + l[:, 1] - l[:, 2]],
        axis=1,
    )
    eps = max(0.0, (delta - viol.min()))
    return l + eps


def cotan_laplacian_from_soup(
    points: np.ndarray, tris: np.ndarray, mollify_factor: float = 1e-5,
    tri_weights: np.ndarray | None = None,
):
    """Intrinsic cotan stiffness + barycentric lumped mass of a triangle soup.

    Operates purely on (mollified) edge lengths so it is robust to skinny or
    flipped triangles. Vectorized over all T triangles. ``tri_weights``
    scales each triangle's stiffness and mass contributions (multiplicity
    weighting of overlapping soups).
    """
    n = points.shape[0]
    p = points[tris]  # (T, 3, 3)
    # Edge lengths opposite each corner: l[:, c] = |edge opposite corner c|
    l = np.stack(
        [np.linalg.norm(p[:, 1] - p[:, 2], axis=1),
         np.linalg.norm(p[:, 2] - p[:, 0], axis=1),
         np.linalg.norm(p[:, 0] - p[:, 1], axis=1)],
        axis=1,
    )
    l = _intrinsic_mollify(l, mollify_factor)
    l2 = l**2
    # Heron (numerically-stable enough after mollification).
    s = 0.5 * l.sum(axis=1)
    area2 = s * (s - l[:, 0]) * (s - l[:, 1]) * (s - l[:, 2])
    area = np.sqrt(np.clip(area2, 1e-300, None))
    # cot(angle at corner c) = (l_a^2 + l_b^2 - l_c^2) / (4 * area)
    cots = np.stack(
        [(l2[:, 1] + l2[:, 2] - l2[:, 0]),
         (l2[:, 2] + l2[:, 0] - l2[:, 1]),
         (l2[:, 0] + l2[:, 1] - l2[:, 2])],
        axis=1,
    ) / (4.0 * area)[:, None]

    if tri_weights is not None:
        cots = cots * tri_weights[:, None]
        area = area * tri_weights

    # Corner c contributes cot_c/2 to the edge opposite c.
    opp = [(1, 2), (2, 0), (0, 1)]
    rows, cols, vals = [], [], []
    for c, (a, b) in enumerate(opp):
        w = 0.5 * cots[:, c]
        ia, ib = tris[:, a], tris[:, b]
        rows += [ia, ib, ia, ib]
        cols += [ib, ia, ia, ib]
        vals += [-w, -w, w, w]
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    vals = np.concatenate(vals)
    L = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()

    mass = np.zeros(n)
    np.add.at(mass, tris.reshape(-1),
              np.repeat(area / 3.0, 3).reshape(-1, 3).reshape(-1))
    # Guard isolated points (no incident triangle).
    mass[mass <= 0] = mass[mass > 0].min() if (mass > 0).any() else 1.0
    M = sp.diags(mass).tocsr()
    return L, M


def point_cloud_laplacian(
    points: np.ndarray, n_neighbors: int = 30, mollify_factor: float = 1e-5,
    use_native: bool | None = None,
):
    """(L, M) for a raw point cloud — drop-in for
    `robust_laplacian.point_cloud_laplacian` (src/utils.py:174).

    L is symmetric PSD (weak cotan Laplacian), M diagonal lumped mass.
    `use_native=None` auto-selects the C++ triangulation kernel
    (csrc/geometry_kernels.cpp, ~10x the Python path) when built.
    """
    points = np.asarray(points, dtype=np.float64)
    from eigenpinns_tpu.geometry import native as _native

    if use_native is None:
        use_native = _native.available()
    if use_native:
        soup = _native.local_triangulations_native(
            points, n_neighbors=n_neighbors)
        key = np.sort(soup, axis=1)
        _, uniq, counts = np.unique(key, axis=0, return_index=True,
                                    return_counts=True)
        order = np.argsort(uniq)
        tris = soup[uniq[order]]
        weights = np.minimum(counts[order].astype(np.float64) / 3.0, 1.0)
    else:
        tris, weights = local_triangulations(
            points, n_neighbors=n_neighbors, return_weights=True)
    return cotan_laplacian_from_soup(points, tris, mollify_factor,
                                     tri_weights=weights)


def mesh_laplacian(verts: np.ndarray, faces: np.ndarray,
                   mollify_factor: float = 1e-5):
    """(L, M) intrinsic cotan Laplacian of an (indexed) triangle mesh —
    the mesh-path analog of `robust_laplacian.mesh_laplacian`."""
    return cotan_laplacian_from_soup(
        np.asarray(verts, dtype=np.float64),
        np.asarray(faces, dtype=np.int64),
        mollify_factor,
    )
