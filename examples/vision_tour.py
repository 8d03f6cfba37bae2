"""Vision tour — every imgproc op, once, on one synthetic scene.

A living inventory of the OpenCV-style surface: filtering, color,
histograms, geometry, segmentation, features, tracking, codecs. Prints a
one-line confirmation per stage; any regression in any facade fails here
first.
"""

import numpy as np

from rustcv_tpu import imgproc
from rustcv_tpu.capture import simulation as sim
from rustcv_tpu.core.mat import Mat
from rustcv_tpu.imgproc import Point, Rect, Scalar
from rustcv_tpu.ops import golden


def main(width: int = 160, height: int = 120) -> int:
    rng = np.random.default_rng(3)
    bgr = sim.synth_bgr(width, height, 5)
    bgr = np.clip(
        bgr.astype(np.int32) + rng.integers(0, 18, bgr.shape), 0, 255
    ).astype(np.uint8)
    mat = Mat.from_array(bgr)
    gray = Mat.from_array(golden.bgr_to_gray(bgr))
    steps = 0

    def ok(name, value=""):
        nonlocal steps
        steps += 1
        print(f"  [{steps:02d}] {name} {value}")

    # --- filtering -------------------------------------------------------
    imgproc.gaussian_blur(mat); ok("gaussian_blur")
    imgproc.box_blur(mat); ok("box_blur")
    imgproc.median_blur(gray); ok("median_blur")
    imgproc.bilateral_filter(gray); ok("bilateral_filter")
    imgproc.sobel_magnitude(mat); ok("sobel_magnitude")
    edges = imgproc.canny(mat); ok("canny")
    imgproc.threshold(gray, 128, 255); ok("threshold")
    imgproc.adaptive_threshold(gray); ok("adaptive_threshold")
    imgproc.erode(gray); imgproc.dilate(gray); ok("erode/dilate")
    imgproc.equalize_hist(gray); ok("equalize_hist")
    imgproc.clahe(gray); ok("clahe")
    imgproc.lut(gray, np.arange(255, -1, -1, dtype=np.uint8)); ok("lut")

    # --- color / histograms ---------------------------------------------
    hsv = imgproc.cvt_hsv(mat); ok("cvt_hsv")
    mask = imgproc.in_range(hsv, (0, 40, 40), (90, 255, 255)); ok("in_range")
    h = imgproc.calc_hist(gray); ok("calc_hist", f"({int(h.sum())} px)")
    model = imgproc.calc_hue_hist(hsv)
    bp = imgproc.back_project(hsv, model); ok("back_project")

    # --- geometry --------------------------------------------------------
    imgproc.resize(mat, width // 2, height // 2, interpolation="area"); ok("resize(area)")
    imgproc.pyr_down(mat); ok("pyr_down")
    imgproc.rotate(mat, 30.0); ok("rotate/warp_affine")
    H = imgproc.get_perspective_transform(
        [(0, 0), (width - 1, 0), (width - 1, height - 1), (0, height - 1)],
        [(5, 3), (width - 6, 0), (width - 1, height - 1), (0, height - 4)],
    )
    imgproc.warp_perspective(mat, H, (width, height)); ok("warp_perspective")
    iy, ix = np.meshgrid(
        np.arange(height, dtype=np.float32), np.arange(width, dtype=np.float32),
        indexing="ij",
    )
    imgproc.remap(mat, ix + 2 * np.sin(iy / 9), iy); ok("remap")

    # --- segmentation ----------------------------------------------------
    n, labels = imgproc.connected_components(mask); ok("connected_components", f"({n})")
    imgproc.connected_components_with_stats(mask); ok("with_stats")
    contours = imgproc.find_contours(mask); ok("find_contours", f"({len(contours)})")
    imgproc.distance_transform(mask); ok("distance_transform")
    imgproc.flood_fill(gray, (5, 5), 99); ok("flood_fill")
    m = imgproc.moments(mask); ok("moments", f"(m00={m['m00']})")
    imgproc.hu_moments(mask); ok("hu_moments")
    lines = imgproc.hough_lines(edges, threshold=30); ok("hough_lines", f"({len(lines)})")

    # --- features / matching / tracking ---------------------------------
    pts = imgproc.good_features_to_track(mat, max_corners=32); ok("good_features", f"({len(pts)})")
    fpts = imgproc.fast_corners(mat, threshold=12); ok("fast_corners", f"({len(fpts)})")
    if len(pts) >= 2:
        imgproc.corner_sub_pix(gray, pts[:8]); ok("corner_sub_pix")
        d, v = imgproc.compute_brief(mat, pts); ok("compute_brief")
        matches = imgproc.match_descriptors(d, d, v, v); ok("match_descriptors", f"({len(matches)})")
        nxt = Mat.from_array(np.roll(bgr, 3, axis=1))
        tracked, st = imgproc.calc_optical_flow_pyr_lk(mat, nxt, pts[:16], win=15, levels=1)
        ok("calc_optical_flow_pyr_lk", f"({int(st.sum())} tracked)")
        if len(matches) >= 2:
            mm, inl = imgproc.estimate_affine_partial_2d(
                pts[matches[:, 0]], pts[matches[:, 1]]
            )
            ok("estimate_affine_partial_2d")
    resp = imgproc.match_template(gray, Mat.from_array(golden.bgr_to_gray(bgr)[20:44, 30:62]))
    ok("match_template", f"peak {imgproc.min_max_loc(resp)[3]}")
    it, win = imgproc.mean_shift(bp, (10, 10, 40, 30)); ok("mean_shift")
    imgproc.cam_shift(bp, (10, 10, 40, 30)); ok("cam_shift")
    imgproc.kmeans_quantize(mat, k=4); ok("kmeans_quantize")
    imgproc.match_shapes(mask, mask); ok("match_shapes")
    flow = imgproc.calc_optical_flow_farneback(
        mat, Mat.from_array(np.roll(bgr, 2, axis=1)), levels=2)
    ok("calc_optical_flow_farneback", f"median fx {np.median(flow[..., 0]):.2f}")
    disp, dvalid = imgproc.stereo_bm(
        gray, Mat.from_array(np.roll(golden.bgr_to_gray(bgr), -4, axis=1)),
        num_disparities=16, block_size=9)
    ok("stereo_bm", f"({int(dvalid.sum())} valid)")
    imgproc.morphology_ex(mask, "gradient", 3); ok("morphology_ex")
    imgproc.filter2d(mat, np.array([[0, -1, 0], [-1, 5, -1], [0, -1, 0]], float))
    ok("filter2d")
    sat = imgproc.integral(gray); ok("integral", f"total {int(sat[-1, -1])}")
    opts, oang, odesc, ovalid = imgproc.orb_features(gray, max_keypoints=64)
    ok("orb_features", f"({int(ovalid.sum())} oriented keypoints)")
    if contours:
        cnt = max(contours, key=len)
        hull = imgproc.convex_hull(cnt)
        area = imgproc.contour_area(hull)
        imgproc.arc_length(cnt); imgproc.bounding_rect(cnt)
        imgproc.min_area_rect(cnt); imgproc.min_enclosing_circle(cnt)
        poly = imgproc.approx_poly_dp(cnt, 2.0)
        ok("convex_hull/area/rects/approx_poly_dp",
           f"(hull {len(hull)} pts, area {area:.0f}, poly {len(poly)})")
    blob_img = np.full((height, width), 220, np.uint8)
    byy, bxx = np.mgrid[0:height, 0:width]
    for (bcx, bcy, br) in [(40, 40, 10), (110, 60, 13)]:
        blob_img[(bxx - bcx) ** 2 + (byy - bcy) ** 2 <= br * br] = 40
    blobs = imgproc.detect_blobs(Mat.from_array(blob_img))
    ok("detect_blobs", f"({len(blobs)} blobs)")
    Kc = np.array([[250.0, 0, width / 2], [0, 250.0, height / 2], [0, 0, 1]])
    objp = np.array([[x * 0.1, y * 0.1, 0.05 * ((x + y) % 3)]
                     for x in range(4) for y in range(3)], float)
    imgp = imgproc.project_points(objp, [0.1, -0.2, 0.05], [0, 0, 1.5], Kc)
    rv, tv = imgproc.solve_pnp(objp, imgp, Kc)
    hsrc = np.array([[0, 0], [100, 5], [95, 80], [5, 78], [50, 40], [20, 60]], float)
    Hm = np.array([[1.05, 0.1, 4.0], [-0.08, 0.98, 2.0], [1e-4, 0, 1.0]])
    hq = np.hstack([hsrc, np.ones((6, 1))]) @ Hm.T
    Hest, hin = imgproc.find_homography(hsrc, hq[:, :2] / hq[:, 2:])
    ok("solve_pnp/find_homography",
       f"(pose err {np.linalg.norm(rv - [0.1, -0.2, 0.05]):.1e}, "
       f"{int(hin.sum())}/6 inliers)")
    try:
        gc_mask = imgproc.grab_cut(mat, rect=(width // 4, height // 4,
                                              width // 2, height // 2),
                                   iter_count=2)
        ok("grab_cut", f"({int(np.isin(gc_mask, [1, 3]).sum())} fg px)")
    except RuntimeError:
        ok("grab_cut", "(native maxflow unavailable)")
    ell = imgproc.get_structuring_element("ellipse", 5)
    imgproc.erode_kernel(mask, ell); imgproc.dilate_kernel(mask, ell)
    imgproc.sep_filter_2d(mat, imgproc.get_gaussian_kernel(5),
                          imgproc.get_gaussian_kernel(5))
    ok("structuring elements / sep_filter_2d")
    if contours:
        big = max(contours, key=len)
        vx, vy, _, _ = imgproc.fit_line(big)
        try:
            (ecx, ecy), (emaj, emin), eang = imgproc.fit_ellipse(big)
            ok("fit_line/fit_ellipse", f"(major {emaj:.0f}px at {eang:.0f} deg)")
        except ValueError:
            ok("fit_line/fit_ellipse", "(degenerate contour)")
    seeds = np.zeros((height, width), np.int32)
    seeds[height // 4, width // 4] = 1
    seeds[3 * height // 4, 3 * width // 4] = 2
    wsout = imgproc.watershed(gray, seeds)
    ok("watershed", f"({(wsout == -1).sum()} ridge px, "
       f"{len(np.unique(wsout[wsout > 0]))} regions)")
    up = imgproc.pyr_up(imgproc.pyr_down(mat))
    ok("pyr_up", f"({up.rows}x{up.cols})")
    K = np.array([[250.0, 0, width / 2], [0, 250.0, height / 2], [0, 0, 1]])
    und = imgproc.undistort(mat, K, (-0.2, 0.05, 0, 0, 0))
    ok("undistort", f"({und.rows}x{und.cols})")
    blended = imgproc.add_weighted(mat, 0.6, und, 0.4)
    imgproc.absdiff(mat, blended); imgproc.bitwise_not(mask)
    q = imgproc.psnr(mat, blended)
    ok("add_weighted/absdiff/bitwise/psnr", f"(psnr {q:.1f} dB)")
    circles = imgproc.hough_circles(gray, dp=2, min_radius=8, max_radius=40,
                                    vote_threshold=15)
    ok("hough_circles", f"({len(circles)} circles)")
    shift, resp = imgproc.phase_correlate(
        gray, Mat.from_array(np.roll(golden.bgr_to_gray(bgr), 4, axis=1)))
    ok("phase_correlate", f"(dx {shift[0]:.2f}, resp {resp:.2f})")
    bgsub = imgproc.create_background_subtractor_mog2(alpha=0.1)
    for _ in range(5):
        bgsub.apply(golden.bgr_to_gray(bgr))
    moved = np.roll(golden.bgr_to_gray(bgr), 8, axis=1)
    fgmask = bgsub.apply(moved)
    ok("background_subtractor_mog2", f"({int(fgmask.sum())} fg px)")

    # --- drawing ---------------------------------------------------------
    canvas = Mat.from_array(bgr.copy())
    imgproc.rectangle(canvas, Rect(10, 10, 60, 40), Scalar(0, 255, 0), 2)
    imgproc.line(canvas, Point(0, 0), Point(width - 1, height - 1), Scalar(255, 0, 0), 2)
    imgproc.circle(canvas, Point(width // 2, height // 2), 20, Scalar(0, 0, 255), 2)
    imgproc.polylines(canvas, [(5, 5), (30, 5), (30, 25)], Scalar(0, 255, 255), 1, closed=True)
    imgproc.put_text(canvas, "tour", Point(8, height - 8), 1.0, Scalar(255, 255, 0))
    ok("rectangle/line/circle/polylines/put_text")

    # --- round-3 wing: stereo, photo, trackers, detection ----------------
    lft = golden.bgr_to_gray(bgr)
    rgt = np.roll(lft, 4, axis=1)
    disp, valid = imgproc.stereo_sgbm(Mat.from_array(lft[..., None]),
                                      Mat.from_array(rgt[..., None]),
                                      num_disparities=16)
    ok("stereo_sgbm", f"{valid.mean():.2f} valid")

    den = imgproc.fast_nl_means_denoising(gray, 10.0, 5, 9)
    ok("fast_nl_means_denoising", den.to_numpy().shape)

    kp, desc = imgproc.sift_features(gray, n_features=25)
    ok("sift_features", f"{len(kp)} kp")

    flow = imgproc.calc_optical_flow_dis(gray, gray)
    ok("calc_optical_flow_dis", f"|u|max {abs(flow).max():.2f}")

    from rustcv_tpu.ops import aruco as _aruco
    from rustcv_tpu.ops import qr as _qr

    dic = _aruco.Dictionary.generate(8, 4, seed=7)
    fid = np.full((height, width), 210, np.uint8)
    fid[8:56, 8:56] = _aruco.draw_marker(dic, 3, 8)
    _, ids = imgproc.detect_aruco_markers(Mat.from_array(fid[..., None]),
                                          dic)
    ok("detect_aruco_markers", f"ids {ids.tolist()}")

    code = _qr.draw(_qr.encode("tour", 1, "L", 0), 4, 4)
    qrc = np.full((code.shape[0] + 16, code.shape[1] + 16), 255, np.uint8)
    qrc[8:8 + code.shape[0], 8:8 + code.shape[1]] = code
    text, _ = imgproc.qr_detect_and_decode(Mat.from_array(qrc[..., None]))
    ok("qr_detect_and_decode", repr(text))

    from rustcv_tpu.ops.tracker import TrackerMOSSE

    trk = TrackerMOSSE(backend="host")
    trk.init(lft, (40, 30, 32, 32))
    okk, box = trk.update(np.roll(lft, 2, axis=1))
    ok("TrackerMOSSE", f"ok={okk}")

    sk, col = imgproc.pencil_sketch(mat)
    ok("pencil_sketch", sk.to_numpy().shape)

    fused = imgproc.merge_mertens([mat, mat, mat])
    ok("merge_mertens", fused.shape)

    # --- round-3b wing: core utils, superpixels, boards, barcodes, 3d ----
    border = imgproc.copy_make_border(lft, 4, 4, 4, 4, "reflect101")
    ok("copy_make_border", border.shape)

    mag, ang = imgproc.cart_to_polar(
        np.float32(lft[1:, :-1]) - np.float32(lft[:-1, :-1]),
        np.float32(lft[:-1, 1:]) - np.float32(lft[:-1, :-1]),
        angle_in_degrees=True)
    ok("cart_to_polar", f"|mag|max {mag.max():.0f}")

    labels, n_sp = imgproc.slic_superpixels(bgr, region_size=20,
                                            num_iterations=3)
    ok("slic_superpixels", f"{n_sp} superpixels")

    resp = imgproc.corner_min_eigen_val(lft)
    ok("corner_min_eigen_val", f"peak {np.asarray(resp).max():.4f}")

    den3 = imgproc.denoise_tvl1([lft, lft, lft], lam=1.0, niters=10)
    ok("denoise_tvl1", den3.shape)

    from rustcv_tpu.ops import barcode as _bc

    strip = _bc.draw_barcode(_bc.encode_ean13("590123412345"), 3, 40)
    codes = imgproc.detect_barcodes(strip)
    ok("detect_barcodes", codes[0] if codes else "none")

    board = _aruco.GridBoard((3, 2), 0.04, 0.02, dic)
    ok("aruco GridBoard", board.draw(cell_px=6).shape)

    verts = np.array([[8.0, 8.0, 1.0], [56.0, 12.0, 1.0],
                      [20.0, 40.0, 1.0]], np.float32)
    colr, dep = imgproc.triangle_rasterize(
        verts, np.array([[0, 1, 2]], np.int32),
        np.array([[255, 0, 0]] * 3, np.float32), width, height)
    ok("triangle_rasterize",
       f"{int(np.isfinite(np.asarray(dep)).sum())} px covered")

    tool = imgproc.IntelligentScissors().apply_image(lft)
    tool.build_map((5, 5))
    path = tool.get_contour((width - 5, height - 5))
    ok("IntelligentScissors", f"{len(path)} path px")

    print(f"vision tour: {steps} stages OK")
    return steps


if __name__ == "__main__":
    main()
