#!/usr/bin/env python3
"""Generate the reference-derived fixtures (FIXTURES.md §3, SURVEY §7.4).

Mirrors the PRNG-dependent part of the reference bit-exactly
(/root/reference/app.py:11-20,117-146), freezing every random draw
into parquet so the Scala engine never needs Python's Mersenne-Twister
streams.  Also emits a 64x64-grid golden cell table computed with the SAME
arithmetic formulas (even-odd ray cast, explicit-step linspace) that the
Spark queries and DuckDB oracles use, so all three agree bit-for-bit on
doubles (every op is an IEEE-754 correctly-rounded primitive: + - * /
sqrt compare).

The generator is a FUNCTION of the reference's sidebar parameters
(app.py:107-113) so the engine can be exercised at more than one point of
that space (VERDICT r7 "Next round #2"):

  python3 tools/gen_fixtures.py                       # defaults -> fixtures/
  python3 tools/gen_fixtures.py --seed 7 --n-blobs 9 \
      --light-x 0.4 --light-y -0.7 --sigmas 3.2 --out fixtures/alt

Dev-only tool (like tools/check_oracle.py); the engine itself is pure
Scala/Spark and only ever READS these parquet files.
"""
import argparse
import math
import os
import random
from colorsys import hsv_to_rgb

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
N_BLOBS = 14
LIGHT = (-0.6, 0.8)  # app.py:109-110 defaults
NV = 280             # vertices per blob, app.py:141
GOLD_W = GOLD_H = 64  # reduced oracle grid (same function, smaller domain)

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures")


def sigma_name(sigma):
    """6.0 -> kernel_sigma6, 2.0 -> kernel_sigma2, 3.2 -> kernel_sigma3p2."""
    s = ("%g" % sigma).replace(".", "p")
    return f"kernel_sigma{s}"


def diverse_palette(n_colors, seed):
    # app.py:11-20, bit-exact
    random.seed(seed)
    rows = []
    for i in range(n_colors):
        h = random.random()
        s = random.uniform(0.35, 0.65)
        v = random.uniform(0.75, 0.95)
        r, g, b = hsv_to_rgb(h, s, v)
        rows.append((i, h, s, v, r, g, b))
    return rows


def linspace_step(lo, hi, n):
    """Explicit-step linspace: lo + i*step, step=(hi-lo)/(n-1).

    numpy.linspace pins the endpoint to `hi` exactly; this variant differs
    from it by <=1 ulp on the last sample only.  Used for the GRID (where
    the Spark/DuckDB sides reproduce the same formula); the vertex ANGLES
    are frozen into parquet so their exact generation does not matter.
    """
    step = (hi - lo) / (n - 1)
    return lo + np.arange(n, dtype=np.float64) * step


def even_odd_mask(gx, gy, vx, vy):
    """Even-odd ray cast of cells (gx,gy) against polygon (vx,vy).

    Same formula (textually) as the Spark query / DuckDB oracle:
      crossing(edge, cell) = ((y1>gy) != (y2>gy))
                             and (gx < x1 + (x2-x1)*(gy-y1)/(y2-y1))
    Closing edge v[n-1]->v[0] included (matplotlib Path fills the polygon
    implicitly closed, app.py:62-64).
    """
    x1, y1 = vx, vy
    x2, y2 = np.roll(vx, -1), np.roll(vy, -1)
    GX = gx[:, None]
    GY = gy[:, None]
    straddle = (y1[None, :] > GY) != (y2[None, :] > GY)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1[None, :] + (x2 - x1)[None, :] * (GY - y1[None, :]) / (y2 - y1)[None, :]
    crossings = (straddle & (GX < xint)).sum(axis=1)
    return (crossings % 2) == 1


def gaussian_kernel(sigma):
    # app.py:22-29, bit-exact
    radius = int(3.0 * sigma + 0.5)
    x = np.arange(-radius, radius + 1)
    k = np.exp(-(x ** 2) / (2 * sigma * sigma))
    k /= k.sum()
    return x, k


def write(name, table):
    os.makedirs(OUT, exist_ok=True)
    pq.write_table(table, os.path.join(OUT, f"{name}.parquet"))
    print(f"wrote {os.path.join(OUT, name)}.parquet rows={table.num_rows}")


def main():
    global SEED, N_BLOBS, LIGHT, OUT
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=SEED)
    ap.add_argument("--n-blobs", type=int, default=N_BLOBS)
    ap.add_argument("--light-x", type=float, default=LIGHT[0])
    ap.add_argument("--light-y", type=float, default=LIGHT[1])
    # default kernels: sigma=6 (the 400-grid shadow sigma at blur=0.015)
    # and sigma=2 (its 64-grid analog, max(2, 64*0.015), app.py:88)
    ap.add_argument("--sigmas", default="6.0,2.0",
                    help="comma-separated kernel sigmas to freeze")
    ap.add_argument("--out", default=OUT)
    a = ap.parse_args()
    SEED, N_BLOBS, LIGHT = a.seed, a.n_blobs, (a.light_x, a.light_y)
    OUT = a.out
    sigmas = [float(x) for x in a.sigmas.split(",")]

    # --- reproduce the reference main script's RNG sequence exactly ------
    random.seed(SEED)          # app.py:117
    np.random.seed(SEED)       # app.py:118
    palette = diverse_palette(N_BLOBS, SEED)  # app.py:119 (re-seeds random)

    write("palette", pa.table({
        "i": pa.array([p[0] for p in palette], pa.int64()),
        "h": pa.array([p[1] for p in palette], pa.float64()),
        "s": pa.array([p[2] for p in palette], pa.float64()),
        "v": pa.array([p[3] for p in palette], pa.float64()),
        "r": pa.array([p[4] for p in palette], pa.float64()),
        "g": pa.array([p[5] for p in palette], pa.float64()),
        "b": pa.array([p[6] for p in palette], pa.float64()),
    }))

    params_rows = []
    verts_cols = {"blob_id": [], "idx": [], "angle": [], "rr": [], "x": [], "y": []}
    golden = {k: [] for k in
              ("blob_id", "y", "x", "gx", "gy", "mask", "shade", "r", "g", "b", "a")}

    for i in range(N_BLOBS):            # app.py:137-146
        r = random.uniform(0.1, 0.26)
        wobble = random.uniform(0.08, 0.22)
        cx, cy = random.uniform(0.12, 0.88), random.uniform(0.12, 0.88)
        angles = np.linspace(0, 2 * np.pi, NV)
        rr = r * (1 + wobble * (np.random.rand(len(angles)) - 0.5) * 2)
        px = cx + rr * np.cos(angles)
        py = cy + rr * np.sin(angles)
        depth = i / float(max(1, N_BLOBS - 1))
        base = palette[i % N_BLOBS]

        verts_cols["blob_id"].extend([i] * NV)
        verts_cols["idx"].extend(range(NV))
        verts_cols["angle"].extend(angles.tolist())
        verts_cols["rr"].extend(rr.tolist())
        verts_cols["x"].extend(px.tolist())
        verts_cols["y"].extend(py.tolist())

        # render_blob geometry, app.py:56-60 (bbox + pad)
        xmin, xmax = px.min(), px.max()
        ymin, ymax = py.min(), py.max()
        pad = 0.4 * max(xmax - xmin, ymax - ymin)
        xmin -= pad; xmax += pad; ymin -= pad; ymax += pad

        cxm, cym = px.mean(), py.mean()  # app.py:70 (frozen: see SURVEY §7.4)

        # 64x64 grid stats frozen for the oracle-gated per-cell queries
        xs = linspace_step(xmin, xmax, GOLD_W)
        ys = linspace_step(ymin, ymax, GOLD_H)
        gx = np.tile(xs, GOLD_H)                 # row-major: y outer, x inner
        gy = np.repeat(ys, GOLD_W)
        nx, ny = gx - cxm, gy - cym
        dist = np.sqrt(nx * nx + ny * ny)
        dist_max = dist.max()
        light = nx * LIGHT[0] + ny * LIGHT[1]
        light_min, light_max = light.min(), light.max()

        params_rows.append(dict(
            blob_id=i, radius=r, wobble=wobble, cx=cx, cy=cy, depth=depth,
            base_r=base[4], base_g=base[5], base_b=base[6],
            xmin=xmin, xmax=xmax, ymin=ymin, ymax=ymax,
            cx_mean=cxm, cy_mean=cym,
            dist_max64=dist_max, light_min64=light_min, light_max64=light_max))

        # golden per-cell pipeline at 64x64 (app.py:66-85 recast)
        mask = even_odd_mask(gx, gy, px, py)
        radial = np.minimum(1.0, np.maximum(0.0, 1.0 - dist / dist_max))
        lightn = (light - light_min) / (light_max - light_min)
        shade = 0.3 + 0.7 * (0.5 * radial + 0.5 * lightn)
        rch = np.minimum(1.0, np.maximum(0.0, base[4] * shade))
        gch = np.minimum(1.0, np.maximum(0.0, base[5] * shade))
        bch = np.minimum(1.0, np.maximum(0.0, base[6] * shade))
        alpha = mask.astype(np.float64) * (0.4 + 0.6 * depth)

        golden["blob_id"].extend([i] * GOLD_W * GOLD_H)
        golden["y"].extend(np.repeat(np.arange(GOLD_H), GOLD_W).tolist())
        golden["x"].extend(np.tile(np.arange(GOLD_W), GOLD_H).tolist())
        golden["gx"].extend(gx.tolist())
        golden["gy"].extend(gy.tolist())
        golden["mask"].extend(mask.tolist())
        golden["shade"].extend(shade.tolist())
        golden["r"].extend(rch.tolist())
        golden["g"].extend(gch.tolist())
        golden["b"].extend(bch.tolist())
        golden["a"].extend(alpha.tolist())

    write("blob_params", pa.table({
        k: pa.array([row[k] for row in params_rows],
                    pa.int64() if k == "blob_id" else pa.float64())
        for k in params_rows[0]}))

    write("blob_vertices", pa.table({
        "blob_id": pa.array(verts_cols["blob_id"], pa.int64()),
        "idx": pa.array(verts_cols["idx"], pa.int32()),
        "angle": pa.array(verts_cols["angle"], pa.float64()),
        "rr": pa.array(verts_cols["rr"], pa.float64()),
        "x": pa.array(verts_cols["x"], pa.float64()),
        "y": pa.array(verts_cols["y"], pa.float64()),
    }))

    for sigma in sigmas:
        name = sigma_name(sigma)
        off, k = gaussian_kernel(sigma)
        write(name, pa.table({
            "offset": pa.array(off.tolist(), pa.int32()),
            "weight": pa.array(k.tolist(), pa.float64()),
        }))

    write("golden_cells_64", pa.table({
        "blob_id": pa.array(golden["blob_id"], pa.int64()),
        "y": pa.array(golden["y"], pa.int32()),
        "x": pa.array(golden["x"], pa.int32()),
        "gx": pa.array(golden["gx"], pa.float64()),
        "gy": pa.array(golden["gy"], pa.float64()),
        "mask": pa.array(golden["mask"], pa.bool_()),
        "shade": pa.array(golden["shade"], pa.float64()),
        "r": pa.array(golden["r"], pa.float64()),
        "g": pa.array(golden["g"], pa.float64()),
        "b": pa.array(golden["b"], pa.float64()),
        "a": pa.array(golden["a"], pa.float64()),
    }))

    # sanity: mask cardinality per blob should be >0 and < full grid
    import collections
    cnt = collections.Counter(
        b for b, m in zip(golden["blob_id"], golden["mask"]) if m)
    assert all(0 < cnt[i] < GOLD_W * GOLD_H for i in range(N_BLOBS)), cnt
    print("mask cells per blob:", dict(sorted(cnt.items())))


if __name__ == "__main__":
    main()
