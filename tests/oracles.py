"""Pure-numpy oracles transliterating the reference CUDA kernel semantics.

Each function mirrors the loop structure of the corresponding kernel in
/root/reference/modules/functional/src/** (cited per function) and uses the
channel-last layouts of pvcnn_tpu ([B, N, C], [B, N, 3], [B, R, R, R, C]).
"""

import numpy as np


def avg_voxelize(features, vox_coords, r):
    """vox.cu:18-72. features [B,N,C], vox_coords [B,N,3] int -> [B,R,R,R,C]."""
    b, n, c = features.shape
    out = np.zeros((b, r * r * r, c), dtype=np.float64)
    cnt = np.zeros((b, r * r * r), dtype=np.int64)
    for bi in range(b):
        for i in range(n):
            x, y, z = vox_coords[bi, i]
            idx = x * r * r + y * r + z
            cnt[bi, idx] += 1
        for i in range(n):
            x, y, z = vox_coords[bi, i]
            idx = x * r * r + y * r + z
            out[bi, idx] += features[bi, i] / cnt[bi, idx]
    return out.reshape(b, r, r, r, c).astype(np.float32)


def trilinear_devoxelize(grid, norm_coords):
    """trilinear_devox.cu:21-105. grid [B,R,R,R,C], norm_coords [B,N,3] in [0,R-1]."""
    b, r = grid.shape[0], grid.shape[1]
    n = norm_coords.shape[1]
    c = grid.shape[-1]
    flat = grid.reshape(b, r * r * r, c)
    out = np.zeros((b, n, c), dtype=np.float64)
    for bi in range(b):
        for i in range(n):
            x, y, z = norm_coords[bi, i]
            xl, yl, zl = np.floor([x, y, z])
            fx, fy, fz = x - xl, y - yl, z - zl
            xl, yl, zl = int(xl), int(yl), int(zl)
            xh = xl + (1 if fx > 0 else 0)
            yh = yl + (1 if fy > 0 else 0)
            zh = zl + (1 if fz > 0 else 0)
            for (xi, wx) in ((xl, 1 - fx), (xh, fx)):
                for (yi, wy) in ((yl, 1 - fy), (yh, fy)):
                    for (zi, wz) in ((zl, 1 - fz), (zh, fz)):
                        w = wx * wy * wz
                        # collapsed corners (frac==0) carry zero weight; adding them
                        # twice with w=0 is harmless, matching the CUDA index trick
                        if (xi, yi, zi) != (xl, yl, zl) and w == 0:
                            continue
                        out[bi, i] += w * flat[bi, xi * r * r + yi * r + zi]
    return out.astype(np.float32)


def trilinear_devoxelize_grad(grad_out, norm_coords, r):
    """trilinear_devoxelize_grad_kernel (trilinear_devox.cu:119-162):
    scatter-add w * grad into the flat grid. grad_out [B,N,C] -> [B,R^3,C]."""
    b, n, c = grad_out.shape
    out = np.zeros((b, r * r * r, c), dtype=np.float64)
    for bi in range(b):
        for i in range(n):
            x, y, z = norm_coords[bi, i]
            xl, yl, zl = np.floor([x, y, z])
            fx, fy, fz = x - xl, y - yl, z - zl
            xl, yl, zl = int(xl), int(yl), int(zl)
            xh = xl + (1 if fx > 0 else 0)
            yh = yl + (1 if fy > 0 else 0)
            zh = zl + (1 if fz > 0 else 0)
            for (xi, wx) in ((xl, 1 - fx), (xh, fx)):
                for (yi, wy) in ((yl, 1 - fy), (yh, fy)):
                    for (zi, wz) in ((zl, 1 - fz), (zh, fz)):
                        w = wx * wy * wz
                        if (xi, yi, zi) != (xl, yl, zl) and w == 0:
                            continue
                        out[bi, xi * r * r + yi * r + zi] += w * grad_out[bi, i]
    return out.astype(np.float32)


def ball_query(centers, points, radius, u):
    """ball_query.cu:19-50 + zero init at ball_query.cpp:22-25."""
    b, m, _ = centers.shape
    n = points.shape[1]
    out = np.zeros((b, m, u), dtype=np.int32)
    r2 = radius * radius
    for bi in range(b):
        for j in range(m):
            cnt = 0
            for k in range(n):
                if cnt >= u:
                    break
                d2 = np.sum((centers[bi, j] - points[bi, k]) ** 2)
                if d2 < r2:
                    if cnt == 0:
                        out[bi, j, :] = k
                    out[bi, j, cnt] = k
                    cnt += 1
    return out


def three_nn(points, centers):
    """neighbor_interpolate.cu:20-79. -> (indices [B,N,3], weights [B,N,3])."""
    b, n, _ = points.shape
    m = centers.shape[1]
    idx = np.zeros((b, n, 3), dtype=np.int32)
    wgt = np.zeros((b, n, 3), dtype=np.float64)
    for bi in range(b):
        for j in range(n):
            best = [1e40, 1e40, 1e40]
            besti = [0, 0, 0]
            for k in range(m):
                d = float(np.sum((points[bi, j] - centers[bi, k]) ** 2))
                if d < best[2]:
                    best[2], besti[2] = d, k
                    if d < best[1]:
                        best[2], besti[2] = best[1], besti[1]
                        best[1], besti[1] = d, k
                        if d < best[0]:
                            best[1], besti[1] = best[0], besti[0]
                            best[0], besti[0] = d, k
            best = [max(min(1e10, d), 1e-10) for d in best]
            d0d1, d0d2, d1d2 = (best[0] * best[1], best[0] * best[2],
                                best[1] * best[2])
            s = d0d1 + d0d2 + d1d2
            wgt[bi, j] = [d1d2 / s, d0d2 / s, d0d1 / s]
            idx[bi, j] = besti
    return idx, wgt.astype(np.float32)


def furthest_point_sample_indices(coords, m):
    """sampling.cu:86-174: seed 0, running min-dist, argmax with first-index ties."""
    b, n, _ = coords.shape
    out = np.zeros((b, m), dtype=np.int32)
    for bi in range(b):
        dist = np.full(n, 1e38, dtype=np.float64)
        old = 0
        for j in range(1, m):
            d = np.sum((coords[bi] - coords[bi, old]) ** 2, axis=-1)
            dist = np.minimum(dist, d)
            old = int(np.argmax(dist))
            out[bi, j] = old
    return out
