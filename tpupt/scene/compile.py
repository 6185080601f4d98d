"""Scene compiler: builder records -> SceneData SoA arrays.

This is the TPU replacement for the reference's runtime object graph: geometry is
flattened (instances pre-baked by the builder), materials and textures are interned into
integer-indexed tables, images are packed into one flat atlas, and light geometry is
appended *after* object geometry so closest-hit ties resolve to objects exactly like
``World::intersect_all`` (world.rs:47-62).
"""

from __future__ import annotations

import os

import numpy as np

from . import builder as B
from . import data as D
from ..core.dtypes import NP_REAL


def _intern_texture(tex, tables) -> int:
    key = id(tex)
    if key in tables["tex_ids"]:
        return tables["tex_ids"][key]

    if isinstance(tex, B.SolidTexture):
        row = dict(type=D.TEX_SOLID, rgb=tex.rgb, inv_scale=0.0, child=(-1, -1), img=(0, 0, 0))
    elif isinstance(tex, B.CheckerTexture):
        c1 = _intern_texture(tex.tex1, tables)
        c2 = _intern_texture(tex.tex2, tables)
        row = dict(
            type=D.TEX_CHECKER,
            rgb=(0.0, 0.0, 0.0),
            inv_scale=1.0 / tex.scale,  # texture.rs:36
            child=(c1, c2),
            img=(0, 0, 0),
        )
    elif isinstance(tex, B.ImageTexture):
        from ..io.image import load_image_f32, load_image_rgb8

        if tex.hdr:
            # hdr=True is only meaningful for the environment map (handled in
            # compile_scene via the f32 env_img + alias tables); object textures
            # stay u8 for reference parity (texture.rs:63-68)
            raise NotImplementedError("hdr=True is supported for Scene.environment only")
        img = load_image_rgb8(tex.path)
        h, w = img.shape[:2]
        offset = sum(len(a) for a in tables["atlas"])
        tables["atlas"].append(img.reshape(-1, 3))
        row = dict(
            type=D.TEX_IMAGE, rgb=(0.0, 0.0, 0.0), inv_scale=0.0, child=(-1, -1), img=(offset, w, h)
        )
    else:
        raise TypeError(f"unknown texture {tex!r}")

    idx = len(tables["tex_rows"])
    tables["tex_rows"].append(row)
    tables["tex_ids"][key] = idx
    return idx


def _intern_material(mat, tables) -> int:
    key = id(mat)
    if key in tables["mat_ids"]:
        return tables["mat_ids"][key]

    params = np.zeros(D.N_PARAMS, dtype=np.float64)
    tex = -1
    rough_tex = -1
    normal_tex = -1

    if isinstance(mat, B.Diffuse):
        mtype = D.MAT_DIFFUSE
        tex = _intern_texture(mat.base_color, tables)
        if mat.normal_map is not None:
            normal_tex = _intern_texture(mat.normal_map, tables)
    elif isinstance(mat, B.Metal):
        mtype = D.MAT_METAL
        tex = _intern_texture(mat.base_color, tables)
        rough_tex = _intern_texture(mat.roughness, tables)
    elif isinstance(mat, B.Glass):
        mtype = D.MAT_GLASS
        tex = _intern_texture(mat.base_color, tables)
        rough_tex = _intern_texture(mat.roughness, tables)
        params[D.P_IOR] = mat.ior
    elif isinstance(mat, B.Principled):
        mtype = D.MAT_PRINCIPLED
        tex = _intern_texture(mat.base_color, tables)
        params[D.P_METALLIC] = mat.metallic
        params[D.P_ROUGHNESS] = mat.roughness
        params[D.P_SUBSURFACE] = mat.subsurface
        params[D.P_SPECULAR] = mat.specular
        params[D.P_SPECULAR_TINT] = mat.specular_tint
        params[D.P_IOR] = mat.ior
        params[D.P_SPEC_TRANS] = mat.spec_trans
        params[D.P_SHEEN] = mat.sheen
        params[D.P_SHEEN_TINT] = mat.sheen_tint
        params[D.P_CLEARCOAT] = mat.clearcoat
        params[D.P_CLEARCOAT_GLOSS] = mat.clearcoat_gloss
    elif isinstance(mat, B.Light):
        mtype = D.MAT_LIGHT
        tex = _intern_texture(mat.emission, tables)
    else:
        raise TypeError(f"unknown material {mat!r}")

    idx = len(tables["mat_rows"])
    tables["mat_rows"].append(
        dict(type=mtype, tex=tex, rough_tex=rough_tex, normal_tex=normal_tex, params=params)
    )
    tables["mat_ids"][key] = idx
    return idx


def _emit_geometry(rec, tables, is_light: bool):
    mid = _intern_material(rec.material, tables)
    if isinstance(rec, B.SphereRec):
        idx = len(tables["sph"])
        tables["sph"].append((rec.center1, rec.center2, rec.radius, mid))
        if is_light:
            tables["lights"].append((D.GEOM_SPHERE, idx))
    elif isinstance(rec, B.QuadRec):
        idx = len(tables["quad"])
        tables["quad"].append((rec.q, rec.u, rec.v, mid))
        if is_light:
            tables["lights"].append((D.GEOM_QUAD, idx))
    elif isinstance(rec, B.MeshRec):
        pos, nrm, uvs, ind = rec.positions, rec.normals, rec.uvs, rec.indices
        for f in ind:
            i0, i1, i2 = int(f[0]), int(f[1]), int(f[2])
            idx = len(tables["tri"])
            v0, v1, v2 = pos[i0], pos[i1], pos[i2]
            if nrm is not None:
                n = (nrm[i0], nrm[i1], nrm[i2])
            else:
                # face normal (mesh.rs:88): normalize(e1 x e2), same for all hits
                fn = np.cross(v1 - v0, v2 - v0)
                ln = np.linalg.norm(fn)
                fn = fn / ln if ln > 0 else np.array([0.0, 0.0, 1.0])
                n = (fn, fn, fn)
            if uvs is not None:
                uv = (uvs[i0], uvs[i1], uvs[i2])
                has_uv = True
            else:
                uv = (np.zeros(2),) * 3
                has_uv = False
            tables["tri"].append((v0, v1, v2, n, uv, has_uv, mid))
            if is_light:
                tables["lights"].append((D.GEOM_TRI, idx))
    else:
        raise TypeError(f"unknown geometry {rec!r}")


class CompiledScene:
    """SceneData + static (trace-time-constant) facts about the scene."""

    def __init__(self, data: D.SceneData, has_lights: bool):
        self.data = data
        self.has_lights = has_lights  # p_light = 0.5 iff lights non-empty (camera.rs:199)


def _default_backend_is_tpu() -> bool:
    import jax

    return jax.default_backend() == "tpu"


def compile_scene(scene: "B.Scene", bvh: bool | None = None) -> CompiledScene:
    import jax.numpy as jnp

    tables = dict(
        sph=[], quad=[], tri=[], lights=[], mat_rows=[], mat_ids={}, tex_rows=[], tex_ids={}, atlas=[]
    )

    # environment must be interned before padding defaults
    env_is_hdr = False
    env_img = np.zeros((1, 3), dtype=NP_REAL)
    env_wh = np.array([1, 1], dtype=np.int32)
    env_alias = np.zeros(1, dtype=np.int32)
    env_prob = np.ones(1, dtype=NP_REAL)
    env_pdf = np.full(1, 1.0 / (4.0 * np.pi), dtype=NP_REAL)
    if isinstance(scene.environment, B.ImageTexture) and scene.environment.hdr:
        # NEW capability (BASELINE.json): full f32 HDR env + importance sampling.
        # The reference would quantize this map to u8 (texture.rs:67) and never
        # sample it; here it joins the NEE/MIS light mixture (ops/envmap.py).
        from ..io.image import load_image_f32
        from ..ops.envmap import build_env_tables

        src = scene.environment.path
        img = (
            np.asarray(src, dtype=NP_REAL)
            if isinstance(src, np.ndarray)
            else load_image_f32(src).astype(NP_REAL)
        )
        h, w = img.shape[:2]
        env_alias, env_prob, env_pdf = build_env_tables(img)
        # env_sam packs alias indices as f32 rows — exact only below 2^24
        assert env_alias.size < (1 << 24), "env map too large for f32-exact alias rows"
        env_img = img.reshape(-1, 3)
        env_wh = np.array([w, h], dtype=np.int32)
        env_is_hdr = True
        env_tex_id = -1
        env_color = np.zeros(3, dtype=NP_REAL)
    elif isinstance(scene.environment, B.ImageTexture):
        env_tex_id = _intern_texture(scene.environment, tables)
        env_color = np.zeros(3, dtype=NP_REAL)
    else:
        env_tex_id = -1
        env_color = np.asarray(scene.environment, dtype=NP_REAL)

    # objects first, then lights: ties go to objects (world.rs:56-60 uses strict <)
    for rec in scene.objects:
        _emit_geometry(rec, tables, is_light=False)
    for rec in scene.lights:
        _emit_geometry(rec, tables, is_light=True)

    f32 = NP_REAL

    def _pad_to_block(rows, pad_row):
        """Pad a table to the intersect sweep's block multiple (8, or 256 if large)."""
        n = max(len(rows), 1)
        blk = 8 if n <= 64 else 256
        target = ((n + blk - 1) // blk) * blk
        return list(rows) + [pad_row] * (target - len(rows))

    # ---- spheres (pad: negative radius is the explicit miss sentinel) ----
    sph = _pad_to_block(tables["sph"], (np.zeros(3), np.zeros(3), -1.0, 0))
    sph_c1 = np.stack([s[0] for s in sph]).astype(f32)
    sph_c2 = np.stack([s[1] for s in sph]).astype(f32)
    sph_r = np.array([s[2] for s in sph], dtype=f32)
    sph_mat = np.array([s[3] for s in sph], dtype=np.int32)

    # ---- quads (pad: zero u,v gives zero normal -> |nd| < eps reject, quad.rs:44) ----
    quad = _pad_to_block(tables["quad"], (np.zeros(3), np.zeros(3), np.zeros(3), 0))
    quad_q = np.stack([q[0] for q in quad]).astype(np.float64)
    quad_u = np.stack([q[1] for q in quad]).astype(np.float64)
    quad_v = np.stack([q[2] for q in quad]).astype(np.float64)
    quad_mat = np.array([q[3] for q in quad], dtype=np.int32)
    n = np.cross(quad_u, quad_v)
    n_len2 = np.maximum((n * n).sum(-1, keepdims=True), 1e-300)
    normal = n / np.sqrt(n_len2)
    quad_w = n / n_len2  # quad.rs:25
    quad_d = (normal * quad_q).sum(-1)  # quad.rs:24

    # ---- triangles (pad: zero edges -> |a| < 1e-8 parallel reject, mesh.rs:60) ----
    n_tri_real = len(tables["tri"])
    BVH_THRESHOLD = 64
    if bvh is None:
        # backend routing (measured, BASELINE.md): on CPU the stackless escape-
        # index traversal wins (>3.7x over the sweep); on TPU per-lane node
        # gathers lose 28x to the sweep, so the TPU path is the Pallas SAH
        # cluster packet kernel (ops/pallas_tri.py) instead. Callers can force
        # either with the `bvh` flag.
        import jax

        use_bvh = n_tri_real >= BVH_THRESHOLD and jax.default_backend() != "tpu"
        use_clusters = n_tri_real >= BVH_THRESHOLD and jax.default_backend() == "tpu"
    else:
        use_bvh = bool(bvh) and n_tri_real >= 2
        use_clusters = False
    tri_real = tables["tri"] or [
        (np.zeros(3), np.zeros(3), np.zeros(3), (np.zeros(3),) * 3, (np.zeros(2),) * 3, False, 0)
    ]
    tri_v0 = np.stack([t[0] for t in tri_real]).astype(f32)
    tri_e1 = np.stack([t[1] - t[0] for t in tri_real]).astype(f32)
    tri_e2 = np.stack([t[2] - t[0] for t in tri_real]).astype(f32)
    tri_n0 = np.stack([t[3][0] for t in tri_real]).astype(f32)
    tri_n1 = np.stack([t[3][1] for t in tri_real]).astype(f32)
    tri_n2 = np.stack([t[3][2] for t in tri_real]).astype(f32)
    tri_uv0 = np.stack([t[4][0] for t in tri_real]).astype(f32)
    tri_uv1 = np.stack([t[4][1] for t in tri_real]).astype(f32)
    tri_uv2 = np.stack([t[4][2] for t in tri_real]).astype(f32)
    tri_has_uv = np.array([t[5] for t in tri_real], dtype=bool)
    tri_mat = np.array([t[6] for t in tri_real], dtype=np.int32)

    tri_perm = None
    use_hbm_clusters = False
    tri_cl = np.zeros((8, 8), dtype=f32)
    tri_cl[:, 0:6] = 1e30  # pad boxes: slab test can never pass
    tri_pk = np.zeros((64, 128), dtype=f32)
    tri_pk2 = np.zeros((64, 128), dtype=f32)
    tri_scl = np.zeros((8, 8), dtype=f32)
    tri_scl[:, 0:6] = 1e30
    if use_bvh or use_clusters:
        # SAH-reorder the triangle table; emit stackless node arrays (CPU path,
        # ops/bvh.py — replaces bvh.rs SAH recursion + mesh.rs:195 nested trees)
        # and the cluster packet tables (TPU path, ops/pallas_tri.py)
        from ..ops.bvh import build_tri_bvh_sah
        from ..ops.pallas_tri import (
            MAX_HBM_CLUSTERS, MAX_PACKED_BYTES, pack_clusters,
        )

        order, nodes, clusters = build_tri_bvh_sah(tri_v0, tri_e1, tri_e2)
        tri_sc_size = 64
        tri_perm = order  # new_index_of_old: inverse permutation, built below
        (tri_v0, tri_e1, tri_e2, tri_n0, tri_n1, tri_n2,
         tri_uv0, tri_uv1, tri_uv2, tri_has_uv, tri_mat) = (
            a[order] for a in (tri_v0, tri_e1, tri_e2, tri_n0, tri_n1, tri_n2,
                               tri_uv0, tri_uv1, tri_uv2, tri_has_uv, tri_mat)
        )
        bvh_min, bvh_max = nodes["bmin"], nodes["bmax"]
        bvh_skip, bvh_start, bvh_count = nodes["skip"], nodes["start"], nodes["count"]
        # cluster tables are built whenever the tree is, so tests/benchmarks can
        # flip the static has_tri_clusters flag post-compile without a rebuild
        cl_box, pk, pk2, sc_box = pack_clusters(
            tri_v0, tri_e1, tri_e2, clusters, tri_n0, tri_n1, tri_n2,
            tri_uv0, tri_uv1, tri_uv2, tri_has_uv, tri_mat,
        )
        if pk.nbytes + pk2.nbytes <= MAX_PACKED_BYTES:
            tri_cl, tri_pk, tri_pk2, tri_scl = cl_box, pk, pk2, sc_box
        elif cl_box.shape[0] <= MAX_HBM_CLUSTERS:
            # HBM routing: re-pack with the HBM supercluster grouping
            # (TPUPT_SC_HBM, default 16 after the round-5 on-chip A/B — the
            # phase-2 scalar compact walks sc_size iterations per hit
            # supercluster and dominated the sc=64 kernel at 67%)
            sc_hbm = int(os.environ.get("TPUPT_SC_HBM", "16"))
            if sc_hbm != tri_sc_size:
                cl_box, pk, pk2, sc_box = pack_clusters(
                    tri_v0, tri_e1, tri_e2, clusters, tri_n0, tri_n1, tri_n2,
                    tri_uv0, tri_uv1, tri_uv2, tri_has_uv, tri_mat,
                    sc_size=sc_hbm,
                )
                tri_sc_size = sc_hbm
            # tables too big for VMEM residency: keep them HBM-resident and let
            # the kernel DMA-stage clusters (ops/pallas_tri.py
            # _tri_cluster_kernel_hbm). Lifts the ~128k-tri cap to the
            # 32768-cluster SMEM-queue bound (~2M tris); the
            # reference handles arbitrary mesh sizes via heap BVHs
            # (mesh.rs:149-197), this is the TPU equivalent.
            tri_cl, tri_pk, tri_pk2, tri_scl = cl_box, pk, pk2, sc_box
            use_hbm_clusters = use_clusters
            use_clusters = False
        else:  # beyond the SMEM queue bound: fall back to the sweep
            use_clusters = False
    else:
        tri_sc_size = 64
        bvh_min = np.zeros((1, 3), dtype=f32)
        bvh_max = np.zeros((1, 3), dtype=f32)
        bvh_skip = np.ones(1, dtype=np.int32)
        bvh_start = np.zeros(1, dtype=np.int32)
        bvh_count = np.zeros(1, dtype=np.int32)

    def _pad_rows(a, pad_value=0):
        n = max(a.shape[0], 1)
        blk = 8 if n <= 64 else 256
        target = ((n + blk - 1) // blk) * blk
        if target == a.shape[0]:
            return a
        pad_shape = (target - a.shape[0],) + a.shape[1:]
        return np.concatenate([a, np.full(pad_shape, pad_value, dtype=a.dtype)], axis=0)

    (tri_v0, tri_e1, tri_e2, tri_n0, tri_n1, tri_n2,
     tri_uv0, tri_uv1, tri_uv2, tri_has_uv, tri_mat) = (
        _pad_rows(a) for a in (tri_v0, tri_e1, tri_e2, tri_n0, tri_n1, tri_n2,
                               tri_uv0, tri_uv1, tri_uv2, tri_has_uv, tri_mat)
    )

    # MXU intersection coefficients (ops/intersect.py _tri_block_mxu). Measured on
    # a v5e: 2x SLOWER than the VPU sweep — the contraction dim is only 10, so the
    # 128-wide systolic array runs at <8% utilization and HIGHEST precision costs
    # 6 passes. Kept as an opt-in (flip has_tri_mxu) and a documented negative
    # result; the dense component sweep stays the TPU default.
    use_mxu = False
    if n_tri_real >= BVH_THRESHOLD:  # build tables whenever large, so the static
        # flags can be flipped post-compile (tests/benchmarks compare all paths)
        z = np.zeros_like(tri_v0[:, :1])
        n_vec = np.cross(tri_e1, tri_e2)
        tri_ca = np.concatenate(
            [np.cross(tri_e2, tri_e1), 0 * tri_v0, 0 * tri_v0, z], axis=1
        ).astype(f32)
        tri_cu = np.concatenate(
            [-np.cross(tri_e2, tri_v0), 0 * tri_v0, tri_e2, z], axis=1
        ).astype(f32)
        tri_cv = np.concatenate(
            [-np.cross(tri_v0, tri_e1), 0 * tri_v0, -tri_e1, z], axis=1
        ).astype(f32)
        tri_ct = np.concatenate(
            [0 * tri_v0, n_vec, 0 * tri_v0, -(tri_v0 * n_vec).sum(-1, keepdims=True)],
            axis=1,
        ).astype(f32)
    else:
        tri_ca = tri_cu = tri_cv = tri_ct = np.zeros((1, 10), dtype=f32)

    # ---- lights (pad row never selected: integrator masks on n_lights) ----
    if tri_perm is not None:
        # triangle table was Morton-reordered: remap triangle light indices
        inv_perm = np.empty_like(tri_perm)
        inv_perm[tri_perm] = np.arange(len(tri_perm), dtype=tri_perm.dtype)
        tables["lights"] = [
            (k, int(inv_perm[g]) if k == D.GEOM_TRI else g) for k, g in tables["lights"]
        ]
    lights = tables["lights"] or [(D.GEOM_SPHERE, 0)]
    light_kind = np.array([l[0] for l in lights], dtype=np.int32)
    light_idx = np.array([l[1] for l in lights], dtype=np.int32)
    has_lights = len(tables["lights"]) > 0

    # kind-uniform light geometry rows for per-lane sampling (see data.py)
    light_geom = np.zeros((len(lights), 10), dtype=f32)
    for i, (k, g) in enumerate(lights):
        if k == D.GEOM_SPHERE:
            light_geom[i, 0:3] = sph_c1[g]
            light_geom[i, 3:6] = sph_c2[g]
            light_geom[i, 6] = sph_r[g]
        elif k == D.GEOM_QUAD:
            light_geom[i, 0:3] = quad_q[g]
            light_geom[i, 3:6] = quad_u[g]
            light_geom[i, 6:9] = quad_v[g]
        else:
            light_geom[i, 0:3] = tri_v0[g]
            light_geom[i, 3:6] = tri_e1[g]
            light_geom[i, 6:9] = tri_e2[g]
        light_geom[i, 9] = k

    # ---- materials ----
    mats = tables["mat_rows"] or [
        dict(type=D.MAT_DIFFUSE, tex=0, rough_tex=-1, normal_tex=-1, params=np.zeros(D.N_PARAMS))
    ]
    mat_type = np.array([m["type"] for m in mats], dtype=np.int32)
    mat_tex = np.array([m["tex"] for m in mats], dtype=np.int32)
    mat_rough_tex = np.array([m["rough_tex"] for m in mats], dtype=np.int32)
    mat_normal_tex = np.array([m["normal_tex"] for m in mats], dtype=np.int32)
    mat_params = np.stack([m["params"] for m in mats]).astype(f32)

    # ---- textures ----
    texs = tables["tex_rows"] or [
        dict(type=D.TEX_SOLID, rgb=(0.0, 0.0, 0.0), inv_scale=0.0, child=(-1, -1), img=(0, 0, 0))
    ]
    tex_type = np.array([t["type"] for t in texs], dtype=np.int32)
    tex_rgb = np.array([t["rgb"] for t in texs], dtype=f32)
    tex_inv_scale = np.array([t["inv_scale"] for t in texs], dtype=f32)
    tex_child = np.array([t["child"] for t in texs], dtype=np.int32)
    tex_img = np.array([t["img"] for t in texs], dtype=np.int32)
    atlas = (
        np.concatenate(tables["atlas"], axis=0)
        if tables["atlas"]
        else np.zeros((1, 3), dtype=np.uint8)
    ).astype(f32) / f32(255.0)  # u8-quantized values, f32 storage (differentiable leaf)

    data = D.SceneData(
        sph_c1=jnp.asarray(sph_c1),
        sph_c2=jnp.asarray(sph_c2),
        sph_r=jnp.asarray(sph_r),
        sph_mat=jnp.asarray(sph_mat),
        quad_q=jnp.asarray(quad_q.astype(f32)),
        quad_u=jnp.asarray(quad_u.astype(f32)),
        quad_v=jnp.asarray(quad_v.astype(f32)),
        quad_w=jnp.asarray(quad_w.astype(f32)),
        quad_n=jnp.asarray(normal.astype(f32)),
        quad_d=jnp.asarray(quad_d.astype(f32)),
        quad_mat=jnp.asarray(quad_mat),
        tri_v0=jnp.asarray(tri_v0),
        tri_e1=jnp.asarray(tri_e1),
        tri_e2=jnp.asarray(tri_e2),
        tri_n0=jnp.asarray(tri_n0),
        tri_n1=jnp.asarray(tri_n1),
        tri_n2=jnp.asarray(tri_n2),
        tri_uv0=jnp.asarray(tri_uv0),
        tri_uv1=jnp.asarray(tri_uv1),
        tri_uv2=jnp.asarray(tri_uv2),
        tri_has_uv=jnp.asarray(tri_has_uv),
        tri_mat=jnp.asarray(tri_mat),
        light_kind=jnp.asarray(light_kind),
        light_idx=jnp.asarray(light_idx),
        light_geom=jnp.asarray(light_geom),
        mat_type=jnp.asarray(mat_type),
        mat_tex=jnp.asarray(mat_tex),
        mat_rough_tex=jnp.asarray(mat_rough_tex),
        mat_normal_tex=jnp.asarray(mat_normal_tex),
        mat_params=jnp.asarray(mat_params),
        tex_type=jnp.asarray(tex_type),
        tex_rgb=jnp.asarray(tex_rgb),
        tex_inv_scale=jnp.asarray(tex_inv_scale),
        tex_child=jnp.asarray(tex_child),
        tex_img=jnp.asarray(tex_img),
        atlas=jnp.asarray(atlas),
        env_color=jnp.asarray(env_color),
        env_tex=jnp.asarray(env_tex_id, dtype=jnp.int32),
        env_img=jnp.asarray(env_img),
        env_wh=jnp.asarray(env_wh),
        env_alias=jnp.asarray(env_alias),
        env_prob=jnp.asarray(env_prob),
        env_pdf=jnp.asarray(env_pdf),
        # packed sampling rows (prob, alias, pdf): one gather per alias draw /
        # pdf eval instead of three 1-D gathers (ops/envmap.py, round 5)
        env_sam=jnp.asarray(
            np.stack(
                [env_prob, env_alias.astype(NP_REAL), env_pdf], axis=-1
            ).astype(NP_REAL)
        ),
        # static specialization facts (part of the jit cache key)
        has_normal_maps=bool((mat_normal_tex >= 0).any()),
        mat_types=tuple(sorted(set(int(t) for t in mat_type))),
        has_image_textures=bool((tex_type == D.TEX_IMAGE).any()) or env_tex_id >= 0,
        has_checker=bool((tex_type == D.TEX_CHECKER).any()),
        rough_all_solid=bool(
            all(
                int(tex_type[int(rt)]) == D.TEX_SOLID
                for rt in mat_rough_tex
                if int(rt) >= 0
            )
        ),
        env_is_map=env_tex_id >= 0,
        env_is_hdr=env_is_hdr,
        # static atlas coordinates of a plain-image env map -> sample_environment
        # fuses the per-miss lookup into one atlas row gather (round 5; the
        # generic eval_texture machinery measured 59% of the lights render)
        env_map_off=(
            int(tex_img[env_tex_id][0])
            if env_tex_id >= 0 and int(tex_type[env_tex_id]) == D.TEX_IMAGE
            else 0
        ),
        env_map_w=(
            int(tex_img[env_tex_id][1])
            if env_tex_id >= 0 and int(tex_type[env_tex_id]) == D.TEX_IMAGE
            else 0
        ),
        env_map_h=(
            int(tex_img[env_tex_id][2])
            if env_tex_id >= 0 and int(tex_type[env_tex_id]) == D.TEX_IMAGE
            else 0
        ),
        n_lights_real=len(tables["lights"]),
        # fused Pallas sphere+quad closest-hit (ops/pallas_hit.py): +10% end-to-end
        # on the Cornell bench (79.7 vs 72.6 M rays/s); CPU keeps the XLA sweep
        # (interpret mode is debug-only)
        use_pallas_hit=_default_backend_is_tpu(),
        has_tri_bvh=use_bvh,
        has_tri_mxu=use_mxu,
        has_tri_clusters=use_clusters,
        has_tri_clusters_hbm=use_hbm_clusters,
        tri_sc_size=tri_sc_size,
        tri_cl=jnp.asarray(tri_cl),
        tri_pk=jnp.asarray(tri_pk),
        tri_pk2=jnp.asarray(tri_pk2),
        tri_scl=jnp.asarray(tri_scl),
        tri_ca=jnp.asarray(tri_ca),
        tri_cu=jnp.asarray(tri_cu),
        tri_cv=jnp.asarray(tri_cv),
        tri_ct=jnp.asarray(tri_ct),
        bvh_min=jnp.asarray(bvh_min),
        bvh_max=jnp.asarray(bvh_max),
        bvh_skip=jnp.asarray(bvh_skip),
        bvh_start=jnp.asarray(bvh_start),
        bvh_count=jnp.asarray(bvh_count),
    )
    # with env importance sampling the env is a light member, so MIS engages
    # (p_light = 0.5) even when the geometry lights list is empty
    return CompiledScene(data, has_lights or env_is_hdr)
