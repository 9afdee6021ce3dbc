#!/usr/bin/env python3
"""Re-measure the reference's compute path on THIS host (numpy-only).

BASELINE.md's 2.68 s was recorded on a 2.60 GHz Xeon; the bench host can
change between rounds, so the reference number must be re-anchored on the
same machine that runs graft's Bench. This recreates the data-processing
path of /root/reference/app.py (render_blob over the default 14-blob,
400x400, sigma=6 configuration) without matplotlib/streamlit, matching
what BASELINE.md describes: Path.contains_points replaced by an
equivalent vectorized even-odd ray-casting test, figure rendering/imshow
omitted, single process, single thread.

Usage: python3 tools/ref_baseline.py [n_repeats]   (default 3, report min)
"""
import sys
import time
import random

import numpy as np


def gaussian_kernel1d(sigma, truncate=3.0):
    # app.py:22-29
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1)
    k = np.exp(-(x ** 2) / (2 * sigma * sigma))
    k /= k.sum()
    return k


def separable_gaussian_blur(img, sigma):
    # app.py:31-37 (apply_along_axis + convolve "same", two passes)
    k = gaussian_kernel1d(sigma)
    tmp = np.apply_along_axis(lambda row: np.convolve(row, k, mode="same"), 1, img)
    return np.apply_along_axis(lambda col: np.convolve(col, k, mode="same"), 0, tmp)


def contains_points_evenodd(px, py, pts):
    # Vectorized even-odd ray casting, equivalent to Path.contains_points
    # on these non-self-intersecting blob polygons (app.py:39-46 via
    # matplotlib; BASELINE.md documents the substitution).
    x1, y1 = px, py
    x2, y2 = np.roll(px, -1), np.roll(py, -1)
    gx = pts[:, 0][:, None]
    gy = pts[:, 1][:, None]
    straddle = (y1[None, :] > gy) != (y2[None, :] > gy)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1[None, :] + (x2 - x1)[None, :] * (gy - y1[None, :]) / (y2 - y1)[None, :]
    cross = straddle & (gx < xint)
    return (cross.sum(axis=1) % 2) == 1


def render_blob_compute(px, py, depth, light_dir=(-0.6, 0.8), blur_strength=0.015):
    # app.py:51-93 minus the two ax.imshow calls.
    xmin, xmax = px.min(), px.max()
    ymin, ymax = py.min(), py.max()
    pad = 0.4 * max(xmax - xmin, ymax - ymin)
    xmin -= pad; xmax += pad
    ymin -= pad; ymax += pad

    H, W = 400, 400
    xs = np.linspace(xmin, xmax, W)
    ys = np.linspace(ymin, ymax, H)
    X, Y = np.meshgrid(xs, ys)
    points = np.vstack((X.ravel(), Y.ravel())).T
    mask = contains_points_evenodd(px, py, points).reshape((H, W))
    mask_f = mask.astype(float)

    cx, cy = px.mean(), py.mean()
    nx, ny = X - cx, Y - cy
    dist = np.sqrt(nx ** 2 + ny ** 2)
    radial = np.clip(1.0 - dist / dist.max(), 0, 1)
    light = np.dot(np.stack([nx, ny], axis=-1), np.array(light_dir))
    light = (light - light.min()) / (light.max() - light.min())
    shade = 0.3 + 0.7 * (0.5 * radial + 0.5 * light)
    base = np.array([0.5, 0.5, 0.5]).reshape((1, 1, 3))
    img_rgb = np.clip(base * shade[..., None], 0, 1)
    alpha = mask_f * (0.4 + 0.6 * depth)

    shadow_sigma = max(2.0, max(W, H) * blur_strength)  # = 6.0
    shadow_mask = separable_gaussian_blur(mask_f, shadow_sigma)
    return mask_f, img_rgb, alpha, shadow_mask


def one_poster(seed=42, n_blobs=14):
    # app.py:117-152 (blob generation loop, sidebar defaults)
    random.seed(seed)
    np.random.seed(seed)
    # diverse_palette(n_blobs, seed=seed) re-seeds `random` and draws
    # 3*n_blobs uniforms BEFORE the blob loop (app.py:119,11-20); consume
    # the identical draws so the measured blobs' geometry matches the
    # reference's actual seed-42 poster, not just its workload shape.
    # (r7 ADVICE #2. The per-blob rgba-array ASSEMBLY — app.py:83-85's
    # np.zeros((H,W,4)) fill — is still omitted: pure memory traffic,
    # no arithmetic; render_blob_compute covers everything computed.)
    random.seed(seed)
    for _ in range(n_blobs):
        random.random(); random.uniform(0.35, 0.65); random.uniform(0.75, 0.95)
    for i in range(n_blobs):
        r = random.uniform(0.1, 0.26)
        wobble = random.uniform(0.08, 0.22)
        cx, cy = random.uniform(0.12, 0.88), random.uniform(0.12, 0.88)
        angles = np.linspace(0, 2 * np.pi, 280)
        rr = r * (1 + wobble * (np.random.rand(len(angles)) - 0.5) * 2)
        px = cx + rr * np.cos(angles)
        py = cy + rr * np.sin(angles)
        depth = i / float(max(1, n_blobs - 1))
        render_blob_compute(px, py, depth)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    times = []
    for _ in range(n):
        t0 = time.time()
        one_poster()
        times.append(time.time() - t0)
    print({"metric": "reference_default_poster", "unit": "sec",
           "min": round(min(times), 3), "all": [round(t, 3) for t in times]})


if __name__ == "__main__":
    main()
