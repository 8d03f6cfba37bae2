import time, numpy as np, jax, jax.numpy as jnp
from rustcv_tpu.ops import golden, warp, optflow as of, ccl, hist, color as col
from rustcv_tpu.capture import simulation as sim

gray = golden.bgr_to_gray(sim.synth_bgr(1920, 1080, 3))
rng = np.random.default_rng(0)
gray = np.clip(gray.astype(np.int32)+rng.integers(0,20,gray.shape),0,255).astype(np.uint8)
bgr = sim.synth_bgr(1920, 1080, 3)
dg = jnp.asarray(gray); db = jnp.asarray(bgr)

def timeit(fn, label, n=20):
    out = fn(); jax.tree_util.tree_map(lambda a: np.asarray(a.reshape(-1)[:1]) if hasattr(a,'reshape') else a, out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn()
    leaves = jax.tree_util.tree_leaves(out)
    np.asarray(leaves[0].reshape(-1)[:1])
    print(f"{label}: {(time.perf_counter()-t0)/n*1e3:.2f} ms", flush=True)

# HSV + inRange 1080p
timeit(lambda: col.in_range(col.bgr_to_hsv(db), (20,40,40),(60,255,255)), "hsv+inRange 1080p")
# equalize 1080p
timeit(lambda: hist.equalize_hist(dg), "equalizeHist 1080p")
# warp rotate 1080p
m = warp.get_rotation_matrix_2d((960.0,540.0), 17.0)
timeit(lambda: warp.warp_affine(dg, m, (1920,1080)), "warpAffine rotate 1080p")
# LK 256 points, 3 levels
m2 = np.array([[1.0,0.0,3.0],[0.0,1.0,-2.0]])
nxt = warp.warp_affine_numpy(gray, m2, (1920,1080), border="replicate")
dn = jnp.asarray(nxt)
pts = jnp.asarray(np.stack([rng.uniform(40,1880,256), rng.uniform(40,1040,256)],axis=-1).astype(np.float32))
timeit(lambda: of.calc_optical_flow_pyr_lk(dg, dn, pts, win=21, levels=3)[0], "LK 256 pts 1080p L3")
# CCL on a thresholded 1080p mask
mask = (gray > 128).astype(np.uint8)
t0 = time.perf_counter()
n, lab = ccl.connected_components(mask)
print(f"connectedComponents 1080p: {(time.perf_counter()-t0)*1e3:.0f} ms first (incl compile), {n} comps", flush=True)
t0 = time.perf_counter()
for _ in range(5): n, lab = ccl.connected_components(mask)
print(f"connectedComponents 1080p steady: {(time.perf_counter()-t0)/5*1e3:.1f} ms", flush=True)
