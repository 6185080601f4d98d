"""Scene intermediate representation: dense SoA arrays, compiled ahead of time.

The reference walks heap graphs of ``Arc<dyn Hittable>`` / ``Arc<dyn Texture>`` objects
(hittable/list.rs:10, bsdf/mod.rs:59) with virtual dispatch per ray. None of that maps to
a TPU: XLA wants static shapes and integer indices. The compiler (scene/compile.py)
flattens every scene into the tables below:

- geometry: sphere / quad / triangle SoA tables (instance transforms and cuboids are
  baked to world space at compile time — exact for every reference scene, since
  instances only wrap cuboids and meshes whose UVs are transform-invariant,
  instance.rs:34-54, cuboid.rs:11-58);
- materials: a type tag + parameter rows (Disney 12-vector, principled.rs:23-42);
- textures: a type tag + params + one flat f32 image atlas gathered by offset;
- lights: index rows pointing back into the geometry tables (the reference keeps lights
  in a *separate* HittableList that is intersected alongside objects, world.rs:47-62 —
  here light geometry lives in the same tables, appended *after* object geometry so that
  equal-distance ties resolve to objects exactly like ``light.dist < obj.dist``).

Every array is padded to at least one row with a degenerate entry (negative-radius
sphere, zero quad, zero-area triangle) so shapes are never empty under jit.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

# material type tags
MAT_DIFFUSE = 0  # bsdf/diffuse.rs (Lambertian, shading normal, optional normal map)
MAT_METAL = 1  # bsdf/metal.rs (GGX VNDF + Schlick, shading normal)
MAT_GLASS = 2  # bsdf/glass.rs (Walter rough dielectric, shading normal)
MAT_PRINCIPLED = 3  # bsdf/principled.rs (4-lobe Disney, geometric normal)
MAT_LIGHT = 4  # material.rs:150-191 (emissive; sample=None, pdf=1, eval=ONE)

# texture type tags
TEX_SOLID = 0
TEX_CHECKER = 1
TEX_IMAGE = 2

# geometry kind tags (light table)
GEOM_SPHERE = 0
GEOM_QUAD = 1
GEOM_TRI = 2

# principled parameter vector layout (mat_params columns)
P_METALLIC = 0
P_ROUGHNESS = 1
P_SUBSURFACE = 2
P_SPECULAR = 3
P_SPECULAR_TINT = 4
P_IOR = 5
P_SPEC_TRANS = 6
P_SHEEN = 7
P_SHEEN_TINT = 8
P_CLEARCOAT = 9
P_CLEARCOAT_GLOSS = 10
N_PARAMS = 11


_STATIC_FIELDS = (
    "has_normal_maps",
    "mat_types",
    "has_image_textures",
    "has_checker",
    "rough_all_solid",
    "env_is_map",
    "env_is_hdr",
    "env_map_off",
    "env_map_w",
    "env_map_h",
    "n_lights_real",
    "has_tri_bvh",
    "has_tri_mxu",
    "use_pallas_hit",
    "has_tri_clusters",
    "has_tri_clusters_hbm",
    "tri_sc_size",
)


def _dataclass_pytree(cls):
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    dyn = [n for n in fields if n not in _STATIC_FIELDS]
    static = [n for n in fields if n in _STATIC_FIELDS]
    jax.tree_util.register_pytree_node(
        cls,
        lambda s: (
            [getattr(s, n) for n in dyn],
            tuple(getattr(s, n) for n in static),
        ),
        lambda aux, xs: cls(**dict(zip(dyn, xs)), **dict(zip(static, aux))),
    )
    return cls


@_dataclass_pytree
class SceneData:
    # spheres (hittable/sphere.rs) — moving spheres lerp c1 -> c2 by ray time
    sph_c1: jnp.ndarray  # [S,3]
    sph_c2: jnp.ndarray  # [S,3]
    sph_r: jnp.ndarray  # [S]
    sph_mat: jnp.ndarray  # [S] int32

    # quads (hittable/quad.rs) — w/normal/d derived at compile time
    quad_q: jnp.ndarray  # [Q,3]
    quad_u: jnp.ndarray  # [Q,3]
    quad_v: jnp.ndarray  # [Q,3]
    quad_w: jnp.ndarray  # [Q,3]   n / |n|^2
    quad_n: jnp.ndarray  # [Q,3]   unit normal
    quad_d: jnp.ndarray  # [Q]     plane offset
    quad_mat: jnp.ndarray  # [Q] int32

    # triangles (hittable/mesh.rs) — instance transforms baked in
    tri_v0: jnp.ndarray  # [T,3]
    tri_e1: jnp.ndarray  # [T,3]  v1 - v0
    tri_e2: jnp.ndarray  # [T,3]  v2 - v0
    tri_n0: jnp.ndarray  # [T,3]  vertex normals (face normal replicated if absent)
    tri_n1: jnp.ndarray  # [T,3]
    tri_n2: jnp.ndarray  # [T,3]
    tri_uv0: jnp.ndarray  # [T,2]
    tri_uv1: jnp.ndarray  # [T,2]
    tri_uv2: jnp.ndarray  # [T,2]
    tri_has_uv: jnp.ndarray  # [T] bool — false => barycentric (u,v) like mesh.rs:100
    tri_mat: jnp.ndarray  # [T] int32

    # lights: rows referencing geometry (world.rs lights list)
    light_kind: jnp.ndarray  # [L] int32 GEOM_*
    light_idx: jnp.ndarray  # [L] int32 index into that geometry table
    # kind-uniform per-light geometry for sampling: [L,10] =
    #   sphere: c1(3), c2(3), radius, 0, 0, kind
    #   quad:   q(3), u(3), v(3), kind
    #   tri:    v0(3), e1(3), e2(3), kind
    light_geom: jnp.ndarray

    # materials
    mat_type: jnp.ndarray  # [M] int32 MAT_*
    mat_tex: jnp.ndarray  # [M] int32 base-color texture id
    mat_rough_tex: jnp.ndarray  # [M] int32 roughness texture id (metal/glass)
    mat_normal_tex: jnp.ndarray  # [M] int32 normal-map texture id, -1 = none
    mat_params: jnp.ndarray  # [M,N_PARAMS] float32 (Disney params; ior reused by glass)
    # emission is `mat_tex` evaluated as a color texture when mat_type == MAT_LIGHT
    # (DiffuseLight::emitted = texture value, material.rs:184-186)

    # textures
    tex_type: jnp.ndarray  # [X] int32 TEX_*
    tex_rgb: jnp.ndarray  # [X,3] solid value (scalar textures use .x)
    tex_inv_scale: jnp.ndarray  # [X] checker inv_scale (texture.rs:36)
    tex_child: jnp.ndarray  # [X,2] int32 checker children
    tex_img: jnp.ndarray  # [X,3] int32 (atlas offset, width, height)
    # flattened image texels as f32 in [0,1]. Values are u8-quantized at load
    # (texture.rs:63-68 parity: images are converted to Rgb8) but stored f32 so
    # the atlas is a differentiable leaf (render/diff.py: gather adjoints give
    # per-texel gradients, SURVEY.md section 7.6)
    atlas: jnp.ndarray  # [P,3] f32

    # environment (camera.rs:16-19,140-151)
    env_color: jnp.ndarray  # [3]
    env_tex: jnp.ndarray  # [] int32 texture id, -1 = constant color

    # full-precision HDR environment + importance sampling (NEW capability vs the
    # reference, which quantizes .hdr files to u8 and never samples the env —
    # texture.rs:63-68, camera.rs:140-151; see BASELINE.json north star):
    # the map is kept as f32 texels; an alias table (Vose) over luminance*sin(theta)
    # texel weights gives O(1) vectorized sampling; env_pdf holds the precomputed
    # solid-angle density per texel for the MIS mixture pdf.
    env_img: jnp.ndarray  # [Hw*Ww,3] f32 texels (dummy [1,3] when not hdr)
    env_wh: jnp.ndarray  # [2] int32 (W, H)
    env_alias: jnp.ndarray  # [Hw*Ww] int32 alias targets
    env_prob: jnp.ndarray  # [Hw*Ww] f32 alias acceptance probabilities
    env_pdf: jnp.ndarray  # [Hw*Ww] f32 solid-angle pdf per texel
    # the three alias-table columns above PACKED as one [Hw*Ww,3] row table
    # (prob, alias-as-f32, pdf): a TPU gather op costs ~5-8 ns/lane regardless
    # of row width up to >=3 (tools/probe_gather.py, round 5), so the sampling
    # path's three separate 1-D gathers collapse into row lookups — one for
    # sample_env_light, one for pdf_env_light. alias fits f32 exactly (indices
    # < 2^24, asserted at compile). Not a differentiable leaf (sampling tables
    # are detached in the backward pass by construction).
    env_sam: jnp.ndarray  # [Hw*Ww,3] f32 (prob, alias, pdf)

    # triangle BVH (ops/bvh.py): DFS pre-order nodes with escape indices; the
    # triangle tables above are Morton-reordered when has_tri_bvh is set.
    # Replaces the reference's per-mesh SAH trees + recursion (bvh.rs, mesh.rs:195).
    bvh_min: jnp.ndarray  # [M,3] f32 (padded by 1e-3 like aabb.rs:16-21)
    bvh_max: jnp.ndarray  # [M,3]
    bvh_skip: jnp.ndarray  # [M] int32 first node after the subtree
    bvh_start: jnp.ndarray  # [M] int32 leaf triangle range start (sorted order)
    bvh_count: jnp.ndarray  # [M] int32 leaf size, 0 = internal node

    # SAH cluster tables for the Pallas packet kernel (ops/pallas_tri.py): the
    # TPU-fast triangle path. tri_cl rows are cluster AABBs [bmin(3), bmax(3),
    # pad(2)]; tri_pk packs each cluster's <=64 triangles into one (8,128) VMEM
    # block (8 tri slots x 16 field lanes per row). Dummy minimal arrays when
    # has_tri_clusters is off.
    tri_cl: jnp.ndarray  # [Cp, 8] f32, Cp multiple of 64
    tri_pk: jnp.ndarray  # [Cp*8, 128] f32 geometry (v0, e1, e2, id per slot)
    tri_pk2: jnp.ndarray  # [Cp*8, 128] f32 shading attrs (n0..n2, uv0..2, mat)
    tri_scl: jnp.ndarray  # [Sp, 8] f32 supercluster AABBs (tri_sc_size clusters each)

    # MXU intersection path (ops/intersect.py _tri_block_mxu): per-triangle
    # coefficient rows of the Möller–Trumbore linear functionals over the ray
    # feature vector [d, o, o×d, 1]. Dummy [1,10] zeros when has_tri_mxu is off.
    tri_ca: jnp.ndarray  # [T,10] a    = d·(e2×e1)
    tri_cu: jnp.ndarray  # [T,10] u·a  = (o×d)·e2 − d·(e2×v0)
    tri_cv: jnp.ndarray  # [T,10] v·a  = −(o×d)·e1 − d·(v0×e1)
    tri_ct: jnp.ndarray  # [T,10] t·a  = o·n − v0·n, n = e1×e2

    # static (hashable, trace-time) facts — part of the jit cache key, enabling
    # per-scene kernel specialization (dead material branches compile out)
    has_normal_maps: bool = False
    mat_types: tuple = ()  # sorted tuple of MAT_* present in the scene
    has_image_textures: bool = False
    # no checker textures in the scene -> eval_texture skips the child-resolve
    # row gather + cell math entirely (round 5: a gather op costs ~5-8 ns/lane
    # and the resolve ran unconditionally on every texture eval)
    has_checker: bool = False
    # every referenced roughness texture is SOLID -> make_shade folds the
    # roughness value into its one material row gather instead of running the
    # whole texture machinery (2 more gathers) for a constant (round 5)
    rough_all_solid: bool = False
    env_is_map: bool = False
    env_is_hdr: bool = False  # f32 HDR env + importance sampling enabled
    # static atlas coordinates of the env image when it is a plain ImageTexture:
    # lets sample_environment fuse the per-miss lookup into ONE atlas row gather
    # instead of the generic eval_texture machinery (texture-table row gather +
    # checker resolve + image gather — measured 59% of the lights-scene render,
    # tools/probe_lights.py round 5). env_map_w == 0 means "use the generic
    # path" (constant color, or a non-image env texture).
    env_map_off: int = 0
    env_map_w: int = 0
    env_map_h: int = 0
    n_lights_real: int = 0  # geometry lights (light table may hold one pad row)
    has_tri_bvh: bool = False  # triangle table is SAH-ordered with BVH nodes
    has_tri_mxu: bool = False  # triangle sweep runs as MXU matmuls
    use_pallas_hit: bool = False  # sphere+quad legs run as the fused Pallas kernel
    has_tri_clusters: bool = False  # triangle leg runs the Pallas cluster kernel
    # same kernel family with the packed tables resident in HBM and clusters
    # staged through a double-buffered VMEM scratch by async DMA — lifts the
    # ~128k-triangle VMEM cap (ops/pallas_tri.py MAX_PACKED_BYTES) to the
    # 32768-cluster SMEM-queue bound, ~2M tris (MAX_HBM_CLUSTERS)
    has_tri_clusters_hbm: bool = False
    # clusters per supercluster in the packed tables (ops/pallas_tri.py
    # pack_clusters sc_size): 64 for VMEM scenes; HBM scenes use a smaller
    # grouping (round-5 A/B) because the in-kernel phase-2 scalar compact
    # walks sc_size serial iterations per HIT supercluster — 67% of the HBM
    # kernel's worst-case row cost at sc=64 (BASELINE.md round 5)
    tri_sc_size: int = 64

    @property
    def n_spheres(self):
        return self.sph_r.shape[0]

    @property
    def n_quads(self):
        return self.quad_d.shape[0]

    @property
    def n_tris(self):
        return self.tri_v0.shape[0]

    @property
    def n_lights(self):
        return self.light_kind.shape[0]


@_dataclass_pytree
class CameraData:
    """Derived camera basis (Camera::init, camera.rs:51-77), precomputed host-side."""

    center: jnp.ndarray  # [3]
    pixel00: jnp.ndarray  # [3]
    pixel_du: jnp.ndarray  # [3]
    pixel_dv: jnp.ndarray  # [3]
    right: jnp.ndarray  # [3]
    up: jnp.ndarray  # [3]
    defocus_radius: jnp.ndarray  # [] tan(defocus_angle/2) * focal_length
    blur_strength: jnp.ndarray  # []
