"""Speed-of-light analysis for the cluster packet kernel (VERDICT round-4 item 6).

Converts "N rays/s" from a trophy into a measurement: computes the kernel's
algorithmic work per ray EXACTLY (the per-row supercluster/cluster queue
statistics, replayed with the same slab arithmetic in numpy) and divides the
v5e VPU's peak vector throughput by it. The result is the hardware ceiling for
THIS traversal algorithm on THIS ray population; measured/SOL is the kernel
efficiency, and SOL itself says whether the remaining gap to a target is
algorithmic (queue too long) or implementational (VPU idle).

Hardware model (TPU v5e "lite", one TensorCore):
- VPU: 4 ALU slots x (8 sublanes x 128 lanes) x ~940 MHz. Counting one op per
  ALU per cycle (no FMA pairing) -> ~3.85e12 vector f32 ops/s. This is the
  conservative denominator; transcendental/divide ops cost more, so real SOL
  is slightly lower.
- HBM: ~819 GB/s (bounds the HBM-resident kernel's DMA staging).

Work model per 128-ray row (counted from ops/pallas_tri.py; each "tile op" is
one (8,128) vector instruction = 1024 lane-ops):
- phase 1 cull: sqn x 8 blocks x ~27 tile ops (slab test of 8 boxes);
- phase 2 compact: scalar, ~sqn x 64 x ~4 scalar cycles (counted separately —
  scalar core overlaps the VPU, so it only binds when the queue is tiny);
- phase 3 MT (phase A): qn x 8 slot-groups x ~62 tile ops;
- phase 3 attributes (phase B): qh x ~170 tile ops, where qh = queued clusters
  that produced at least one MT candidate (the lax.cond gate);
- recull gate: qn/8 chunks x ~30 tile ops.

The `grads` mode (VERDICT round-4 item 1) is analytic instead of replayed:
the backward config is Cornell (no triangle kernel), so its work model is the
prim-scene bounce (~2.5k lane-ops/ray: 1360 padded prim-block ops + ~1.1k
shade/MIS/RNG — BASELINE.md round 4) times the fwd+bwd multiplier of the
checkpointed scan: 1x forward + ~1x remat replay + ~2x VJP arithmetic = ~4x,
=> ~10k lane-ops per counted ray (the ray counter counts FORWARD
intersections only; the backward replays each under rematerialization).
VPU SOL = 3.85e12 / 10k = ~385M rays/s — the bench's sol_pct denominator.

Usage: /opt/venv/bin/python tools/roofline.py [scene6|bigmesh|grads] [--rays N]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # pure analysis — never touch the TPU
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import numpy as np

VPU_OPS = 3.85e12  # v5e vector f32 ops/s (4 ALUs x 1024 lanes x 940 MHz)
HBM_BPS = 819e9

TILE = 8 * 128  # lane-ops per (8,128) vector instruction
CULL_TILE_OPS = 27  # slab test of an (8-box, 128-lane) block
MT_TILE_OPS = 62  # Moller-Trumbore slot-group incl. compares/selects
PHASEB_TILE_OPS = 170  # 8x16 attribute selects + interpolation + reductions
RECULL_TILE_OPS = 30  # chunk gather + slab + cond


def slab_rows(boxes, o, d, t_seed, tmin):
    """Any-lane hit + nearest entry per (row, box), rows of 128 rays.

    boxes [C,6] (bmin,bmax); o,d [R,128,3]; t_seed [R,128]. Returns
    hit [R,C] bool, tn_min [R,C] (BIG where miss)."""
    inv = 1.0 / np.where(np.abs(d) < 1e-20, np.where(d < 0, -1e-20, 1e-20), d)
    R = o.shape[0]
    C = boxes.shape[0]
    hit = np.zeros((R, C), bool)
    tnm = np.full((R, C), 3e38, np.float32)
    for r in range(R):  # loop rows to bound memory; vector over (C, 128)
        t1 = (boxes[None, :, 0:3] - o[r, :, None, :]) * inv[r, :, None, :]  # (128,C,3)
        t2 = (boxes[None, :, 3:6] - o[r, :, None, :]) * inv[r, :, None, :]
        tn = np.maximum(np.minimum(t1, t2).max(axis=2), tmin)  # (128,C)
        tf = np.minimum(np.maximum(t1, t2).min(axis=2), t_seed[r][:, None])
        h = tn <= tf
        hit[r] = h.any(axis=0)
        tn = np.where(h, tn, 3e38)
        tnm[r] = tn.min(axis=0)
    return hit, tnm


def analyze(sd, o, d, t_seed, tmin=1e-3):
    """Exact queue statistics + work model for a ray population."""
    n = o.shape[0] - (o.shape[0] % 128)
    R = n // 128
    o = o[:n].reshape(R, 128, 3).astype(np.float32)
    d = d[:n].reshape(R, 128, 3).astype(np.float32)
    ts = t_seed[:n].reshape(R, 128).astype(np.float32)

    scl = np.asarray(sd.tri_scl)  # (S, 8)
    cl = np.asarray(sd.tri_cl)
    sc_boxes = np.concatenate([scl[:, 0:3], scl[:, 3:6]], axis=1)
    cl_boxes = np.concatenate([cl[:, 0:3], cl[:, 3:6]], axis=1)

    sc_hit, _ = slab_rows(sc_boxes, o, d, ts, tmin)  # (R, S)
    cl_hit, _ = slab_rows(cl_boxes, o, d, ts, tmin)  # (R, C)
    # clusters only enter the queue if their supercluster was hit
    sc_of_cl = np.arange(cl_boxes.shape[0]) // int(getattr(sd, "tri_sc_size", 64))
    queued = cl_hit & sc_hit[:, sc_of_cl]

    sqn = sc_hit.sum(axis=1)  # (R,)
    qn = queued.sum(axis=1)

    # MT candidate probability per queued cluster: sampled MT over a row subset
    # (only used for the phase-B gate rate; 32 rows is plenty)
    sub = min(R, 32)
    v0 = np.asarray(sd.tri_v0)
    e1 = np.asarray(sd.tri_e1)
    e2 = np.asarray(sd.tri_e2)
    qh_frac = _phaseb_rate(v0, e1, e2, cl, queued[:sub], o[:sub], d[:sub], ts[:sub], tmin)

    tile_ops = (
        sqn * 8 * CULL_TILE_OPS
        + qn * 8 * MT_TILE_OPS
        + qn * qh_frac * PHASEB_TILE_OPS
        + (qn / 8.0) * RECULL_TILE_OPS
    )
    lane_ops = tile_ops * TILE  # total vector lane-ops per row
    ops_per_ray = lane_ops.mean() / 128.0
    sol = VPU_OPS / (lane_ops.mean() / 128.0)
    # HBM kernel: 8 KB staged per queued cluster per row
    hbm_bytes_per_ray = qn.mean() * 8192 / 128.0
    hbm_sol = HBM_BPS / hbm_bytes_per_ray if hbm_bytes_per_ray else float("inf")
    return dict(
        rows=R, sqn_mean=float(sqn.mean()), qn_mean=float(qn.mean()),
        qh_frac=float(qh_frac), ops_per_ray=float(ops_per_ray),
        sol_rays_per_s=float(sol), hbm_sol_rays_per_s=float(hbm_sol),
    )


def _phaseb_rate(v0, e1, e2, cl, queued, o, d, ts, tmin):
    """Fraction of queued clusters whose 64 triangles produce >=1 MT candidate
    for >=1 lane of the row (the phase-B lax.cond gate rate)."""
    hits = 0
    total = 0
    for r in range(queued.shape[0]):
        cids = np.nonzero(queued[r])[0]
        total += len(cids)
        for c in cids:
            lo = c * 64
            tv0 = v0[lo : lo + 64]
            te1 = e1[lo : lo + 64]
            te2 = e2[lo : lo + 64]
            if not len(tv0):
                continue
            if _mt_any(tv0, te1, te2, o[r], d[r], ts[r], tmin):
                hits += 1
    return hits / max(total, 1)


def _mt_any(v0, e1, e2, o, d, t_seed, tmin):
    h = np.cross(d[:, None, :], e2[None, :, :])
    a = np.einsum("tj,rtj->rt", e1, h)
    f = 1.0 / np.where(np.abs(a) < 1e-8, 1.0, a)
    s = o[:, None, :] - v0[None, :, :]
    u = f * np.einsum("rtj,rtj->rt", s, h)
    q = np.cross(s, e1[None, :, :])
    v = f * np.einsum("rj,rtj->rt", d, q)
    t = f * np.einsum("tj,rtj->rt", e2, q)
    ok = (
        (np.abs(a) >= 1e-8) & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1)
        & (t > tmin) & (t < t_seed[:, None])
    )
    return bool(ok.any())


GRADS_FWD_OPS = 2.5e3  # cornell bounce lane-ops/ray (BASELINE.md round-4 table)
GRADS_BWD_MULT = 4.0  # fwd + remat replay + ~2x VJP arithmetic


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "scene6"
    if name == "grads":
        ops = GRADS_FWD_OPS * GRADS_BWD_MULT
        sol = VPU_OPS / ops
        print(
            f"grads (cornell depth-50 fwd+bwd, analytic): ops/ray={ops:.0f} "
            f"SOL={sol/1e6:.1f}M rays/s", flush=True,
        )
        return
    if name == "scene6":
        from tpupt.scenes import everything_scene

        sd = everything_scene(64, 8)[0].compile().data
    else:
        from tpupt.io.obj import load_obj, subdivide_mesh
        from tpupt.scene.builder import Diffuse, Scene

        s = Scene()
        s.add_mesh(subdivide_mesh(load_obj("/root/reference/assets/bunny.obj"), 3),
                   Diffuse((0.7, 0.7, 0.7)), scale=20.0)
        s.environment = (1.0, 1.0, 1.0)
        sd = s.compile().data

    B = 64 * 1024
    rng = np.random.default_rng(0)
    o = rng.normal(size=(B, 3)).astype(np.float32)
    o = 5.0 * o / np.linalg.norm(o, axis=1, keepdims=True)
    d = rng.normal(size=(B, 3)).astype(np.float32)
    d = d / np.linalg.norm(d, axis=1, keepdims=True)

    for label, seed in [("worst(seed=BIG)", np.full(B, 3e38, np.float32)),
                        ("seeded(t=2)", np.full(B, 2.0, np.float32))]:
        r = analyze(sd, o, d, seed)
        print(f"{name} {label}: sqn={r['sqn_mean']:.2f} qn={r['qn_mean']:.2f} "
              f"phaseB_rate={r['qh_frac']:.2f} ops/ray={r['ops_per_ray']:.0f} "
              f"SOL={r['sol_rays_per_s']/1e6:.1f}M rays/s "
              f"(HBM SOL={r['hbm_sol_rays_per_s']/1e6:.1f}M)", flush=True)


if __name__ == "__main__":
    main()
