"""Connected components (4-connectivity) — scan-based label propagation.

``connectedComponents`` is the textbook "sequential" vision op (union-find
over a raster scan). The TPU formulation replaces pointer chasing with
SEGMENTED MIN-SCANS: initialize every foreground pixel with its flat index,
then repeatedly sweep a run-limited cumulative-min forward and backward
along rows and columns (``jax.lax.associative_scan`` with a reset-at-
background combiner). Each 4-sweep round lets labels flow around one
"corner" of a component, so the round count needed is the component
geometry's spiral depth — a handful for blob-like masks — inside a
``lax.while_loop`` with a fixed-point (no-change) exit.

Output labels are compacted to 1..N on the host (tiny unique() pass);
background = 0. Matches the trivially-correct BFS oracle exactly.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

_INF = jnp.int32(2**30)


def _seg_min_scan(vals: jax.Array, fg: jax.Array, axis: int, reverse: bool):
    """Run-limited cumulative min along ``axis``: mins propagate through
    contiguous foreground runs and reset at background pixels."""
    # Elements: (m, b) — m = running min, b = 1 while the run is unbroken
    # back to the segment start. Combine: (m1,b1)·(m2,b2) =
    # (min(m2, m1 if b2 else ∞), b1&b2) — associative.
    axis = axis % vals.ndim  # associative_scan's reverse needs axis >= 0
    m0 = jnp.where(fg, vals, _INF)
    b0 = fg.astype(jnp.int32)

    def comb(a, b):
        m1, b1 = a
        m2, b2 = b
        m = jnp.minimum(m2, jnp.where(b2 > 0, m1, _INF))
        return m, b1 * b2

    m, _ = jax.lax.associative_scan(comb, (m0, b0), axis=axis, reverse=reverse)
    return jnp.where(fg, jnp.minimum(vals, m), _INF)


def _round(labels: jax.Array, fg: jax.Array) -> jax.Array:
    labels = _seg_min_scan(labels, fg, axis=-1, reverse=False)
    labels = _seg_min_scan(labels, fg, axis=-1, reverse=True)
    labels = _seg_min_scan(labels, fg, axis=-2, reverse=False)
    labels = _seg_min_scan(labels, fg, axis=-2, reverse=True)
    return labels


@partial(jax.jit, static_argnames=("max_rounds",))
def _label_device(mask: jax.Array, max_rounds: int = 256) -> jax.Array:
    h, w = mask.shape[-2], mask.shape[-1]
    fg = mask != 0
    init = jnp.arange(h * w, dtype=jnp.int32).reshape(mask.shape)
    init = jnp.where(fg, init, _INF)

    def cond(state):
        i, cur, changed = state
        return (i < max_rounds) & changed

    def body(state):
        i, cur, _ = state
        nxt = _round(cur, fg)
        return i + 1, nxt, jnp.any(nxt != cur)

    _, out, changed = jax.lax.while_loop(cond, body, (0, init, jnp.bool_(True)))
    return jnp.where(fg, out, -1), jnp.logical_not(changed)


def connected_components(mask, max_rounds: int = 256):
    """u8/bool mask (H, W) → (count, labels int32 (H, W)); background 0,
    components 1..count ordered by their minimum flat index (the raster-
    first pixel — a deterministic, content-independent order). Raises if
    the fixed point isn't reached within ``max_rounds`` sweep rounds (only
    pathological serpentine masks need more than a few dozen)."""
    raw, converged = _label_device(jnp.asarray(mask), max_rounds)
    if not bool(converged):
        raise ValueError(
            f"connected_components: no fixed point in {max_rounds} rounds "
            "(serpentine mask?) — raise max_rounds"
        )
    return _compact(np.asarray(raw))


def _compact(raw: np.ndarray):
    fg = raw >= 0
    fgv = raw[fg]
    uniq = np.unique(fgv)
    out = np.zeros(raw.shape, np.int32)
    if uniq.size:
        # uniq is sorted: searchsorted IS the rank remap (vectorized; a
        # per-pixel Python dict.get cost seconds on dense 1080p masks).
        out[fg] = np.searchsorted(uniq, fgv).astype(np.int32) + 1
    return int(uniq.size), out


def connected_components_with_stats(mask, max_rounds: int = 256):
    """OpenCV ``connectedComponentsWithStats``: (count, labels, stats,
    centroids). ``stats`` int64 [count+1, 5] rows = (left, top, width,
    height, area) — row 0 is background; ``centroids`` float64
    [count+1, 2] (x, y). Device labeling + vectorized host reductions."""
    n, labels = connected_components(mask, max_rounds=max_rounds)
    h, w = labels.shape
    stats = np.zeros((n + 1, 5), np.int64)
    cents = np.full((n + 1, 2), np.nan)
    flat = labels.reshape(-1)
    area = np.bincount(flat, minlength=n + 1)
    ys, xs = np.divmod(np.arange(h * w), w)
    sx = np.bincount(flat, weights=xs, minlength=n + 1)
    sy = np.bincount(flat, weights=ys, minlength=n + 1)
    stats[:, 4] = area
    left = np.full(n + 1, w, np.int64)
    top = np.full(n + 1, h, np.int64)
    right = np.full(n + 1, -1, np.int64)
    bot = np.full(n + 1, -1, np.int64)
    np.minimum.at(left, flat, xs)
    np.minimum.at(top, flat, ys)
    np.maximum.at(right, flat, xs)
    np.maximum.at(bot, flat, ys)
    pop = area > 0
    stats[pop, 0] = left[pop]
    stats[pop, 1] = top[pop]
    stats[pop, 2] = right[pop] - left[pop] + 1
    stats[pop, 3] = bot[pop] - top[pop] + 1
    with np.errstate(invalid="ignore"):
        cents[pop, 0] = sx[pop] / area[pop]
        cents[pop, 1] = sy[pop] / area[pop]
    return n, labels, stats, cents


def flood_fill(
    img,
    seed: tuple,
    new_val: int,
    lo_diff: int = 0,
    up_diff: int = 0,
    max_rounds: int = 256,
):
    """OpenCV ``floodFill`` (fixed-range variant): fill the 4-connected
    region around ``seed`` = (x, y) whose values lie within
    [seed−lo_diff, seed+up_diff], with ``new_val``. Returns (filled image,
    pixel count, mask u8). Reuses the device component labeler over the
    tolerance mask."""
    a = np.asarray(img)
    if a.ndim != 2:
        raise ValueError("flood_fill: gray (2-D) input required")
    x, y = int(seed[0]), int(seed[1])
    if not (0 <= x < a.shape[1] and 0 <= y < a.shape[0]):
        raise ValueError(f"flood_fill: seed {seed} outside image")
    sv = int(a[y, x])
    tol = (a.astype(np.int32) >= sv - lo_diff) & (a.astype(np.int32) <= sv + up_diff)
    _, labels = connected_components(tol.astype(np.uint8), max_rounds=max_rounds)
    region = labels == labels[y, x]
    out = a.copy()
    out[region] = new_val
    return out, int(region.sum()), (region * np.uint8(255))


_MOORE = [(-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1)]


def find_contours(mask, max_rounds: int = 256):
    """External contours of each 4-connected component (OpenCV
    ``findContours`` RETR_EXTERNAL + CHAIN_APPROX_NONE role).

    Device labeling (:func:`connected_components`) partitions the mask;
    the host then Moore-traces each component's outer boundary clockwise
    from its raster-first pixel. Returns a list of int32 [K, 2] (x, y)
    arrays, one per component, in component order; single-pixel components
    yield a 1-point contour. Host work = one O(area log area) argsort to
    locate every component's start pixel + O(Σ perimeters) tracing."""
    n, labels = connected_components(mask, max_rounds=max_rounds)
    h, w = labels.shape
    contours = []
    # Component start pixels in ONE pass (per-component full-image scans
    # would make this O(n_components · H · W) on speckled masks): labels
    # are numbered in raster order of their first pixel, so the first
    # occurrence index of each label IS its trace start.
    flat = labels.reshape(-1)
    order = np.argsort(flat, kind="stable")
    sorted_labels = flat[order]
    first_idx = np.searchsorted(sorted_labels, np.arange(1, n + 1))
    starts = order[first_idx]
    for comp in range(1, n + 1):
        sy, sx = divmod(int(starts[comp - 1]), w)

        def fg(y, x):
            return 0 <= y < h and 0 <= x < w and labels[y, x] == comp

        # Moore-neighbor tracing; the walk is deterministic in the state
        # (cur, backtrack), so the FIRST repeated state closes the cycle
        # exactly once (plain return-to-start double-traces shapes whose
        # boundary passes the start twice; the initial state itself may
        # sit just off the cycle for 1-px-thin shapes).
        cur, prev = (sy, sx), (sy, sx - 1)
        seen = set()
        contour = []
        while (cur, prev) not in seen:
            seen.add((cur, prev))
            contour.append((cur[1], cur[0]))
            pi = _MOORE.index((prev[0] - cur[0], prev[1] - cur[1]))
            nxt = None
            for k in range(1, 9):
                dy, dx = _MOORE[(pi + k) % 8]
                cand = (cur[0] + dy, cur[1] + dx)
                if fg(*cand):
                    nxt = cand
                    # the neighbor just BEFORE the hit becomes the backtrack
                    pdy, pdx = _MOORE[(pi + k - 1) % 8]
                    prev = (cur[0] + pdy, cur[1] + pdx)
                    break
            if nxt is None:
                break  # isolated pixel
            cur = nxt
        if len(contour) > 1 and contour[-1] == contour[0]:
            contour.pop()  # off-cycle initial state duplicated the start
        contours.append(np.asarray(contour, np.int32))
    return contours


# ---------------------------------------------------------------------------
# Oracle: plain BFS flood fill (4-connectivity)
# ---------------------------------------------------------------------------


def connected_components_numpy(mask: np.ndarray):
    from collections import deque

    h, w = mask.shape
    fg = mask != 0
    labels = np.zeros((h, w), np.int32)
    count = 0
    for y in range(h):
        for x in range(w):
            if fg[y, x] and labels[y, x] == 0:
                count += 1
                q = deque([(y, x)])
                labels[y, x] = count
                while q:
                    cy, cx = q.popleft()
                    for ny, nx in ((cy - 1, cx), (cy + 1, cx), (cy, cx - 1), (cy, cx + 1)):
                        if 0 <= ny < h and 0 <= nx < w and fg[ny, nx] and labels[ny, nx] == 0:
                            labels[ny, nx] = count
                            q.append((ny, nx))
    return count, labels


def _minplus_scan(d: jax.Array, axis: int, reverse: bool) -> jax.Array:
    """Tropical scan: out[i] = min_{j<=i} (d[j] + (i-j)) — the running
    "distance grows by 1 per step" relaxation, exact via associative_scan
    over the semiring of functions x ↦ min(x + n, m):
    (n1, m1)∘(n2, m2) = (n1+n2, min(m1+n2, m2))."""
    axis = axis % d.ndim

    def comb(a, b):
        n1, m1 = a
        n2, m2 = b
        return n1 + n2, jnp.minimum(m1 + n2, m2)

    ones = jnp.ones_like(d)
    _, m = jax.lax.associative_scan(comb, (ones, d), axis=axis, reverse=reverse)
    return m


@jax.jit
def _distance_l1_device(mask: jax.Array) -> jax.Array:
    """Sources (distance 0) are the ZERO pixels of ``mask`` — the OpenCV
    convention folded into the program (device inputs never round-trip
    to the host)."""
    big = jnp.int32(1 << 20)
    d = jnp.where(mask == 0, 0, big)
    d = jnp.minimum(_minplus_scan(d, -1, False), _minplus_scan(d, -1, True))
    d = jnp.minimum(_minplus_scan(d, -2, False), _minplus_scan(d, -2, True))
    return d


def distance_transform_l1(mask) -> np.ndarray:
    """Exact L1 (city-block) distance to the nearest ZERO pixel of a u8
    mask (OpenCV ``distanceTransform`` with DIST_L1): int32 (H, W); all-
    nonzero masks saturate at 2^20.

    Four tropical min-plus associative scans (left/right then up/down):
    per-row 1-D L1 distance, then the vertical min-plus with the |Δy|
    kernel — exact because the kernel is 1-Lipschitz, so the up/down
    relaxations reach the true minimum. No iteration to a fixed point."""
    return np.asarray(_distance_l1_device(jnp.asarray(mask)))


def distance_transform_l1_numpy(mask: np.ndarray) -> np.ndarray:
    """BFS oracle (exact L1 distance to the nearest zero pixel)."""
    from collections import deque

    m = np.asarray(mask)
    h, w = m.shape
    big = 1 << 20
    dist = np.full((h, w), big, np.int32)
    q = deque()
    for y in range(h):
        for x in range(w):
            if m[y, x] == 0:
                dist[y, x] = 0
                q.append((y, x))
    while q:
        y, x = q.popleft()
        for ny, nx in ((y - 1, x), (y + 1, x), (y, x - 1), (y, x + 1)):
            if 0 <= ny < h and 0 <= nx < w and dist[ny, nx] > dist[y, x] + 1:
                dist[ny, nx] = dist[y, x] + 1
                q.append((ny, nx))
    return dist
