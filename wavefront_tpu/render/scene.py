"""Device-resident scene state.

Reference: src/render_system/scene.rs — an object store keyed by entity id
with BLAS/TLAS builds, a light TLAS, an instance buffer of device pointers,
and a deferred-destruction ring.  On TPU none of that machinery survives:

  * voxel terrain is ONE dense (Gx,Gy,Gz) uint8 grid in HBM (the DDA's
    acceleration structure *is* the data);
  * dynamic entities are a fixed-budget SoA triangle pool (replacing
    per-entity BLAS + instance device pointers, vertex.rs:51-59);
  * the light TLAS/BLAS pair becomes one global light BVH (lights.py);
  * buffer lifetime is managed by XLA/jit donation — no GC ring.

`VoxelScene` owns the host-side state and mirrors it into `SceneArrays`
(a pytree of jnp arrays) consumed by the jitted frame function.  Block
edits are incremental: a grid `.at[].set()` plus a light-set rebuild only
when an emissive block is involved (the reference instead re-meshes the
chunk and rebuilds BLAS+TLAS, chunk_manager.rs:331-392).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from wavefront_tpu.render import lights as lights_mod
from wavefront_tpu.render.wavefront import LightArrays
from wavefront_tpu.world.blocks import BlockRegistry


class SceneArrays(NamedTuple):
    """Everything the jitted frame function needs, as one pytree."""

    grid: jax.Array            # (Gx,Gy,Gz) u8
    aux_grid: jax.Array        # (Gx,Gy,Gz) i32 DDA class+distance (intersect.py)
    grid_origin: jax.Array     # (3,) i32 world coords of grid[0,0,0]
    # block tables, padded to 256 entries for safe u8 gathers
    transparent: jax.Array     # (256,) bool
    translucent: jax.Array     # (256,) bool
    luminescent: jax.Array     # (256,) bool
    material_offset: jax.Array  # (256, 6) i32 texture slot per block face
    # texture atlas [T, 3(kind), H, W, 4]
    atlas: jax.Array
    # packed atlas [T, H, W, 12]: all three kinds' RGBA in one row so a
    # texel fetch is a single gather
    atlas_packed: jax.Array
    # dynamic entity triangle pool
    tri_verts: jax.Array       # (E, 3, 3) f32 world space
    tri_uv: jax.Array          # (E, 3, 2) f32
    tri_tex: jax.Array         # (E,) i32 texture slot
    tri_active: jax.Array      # (E,) bool
    # lights
    lights: LightArrays
    # windowed-tracer tables (kernels/window_trace.py); None when the
    # window doesn't satisfy the pack constraints (> 16 block ids per 32^3
    # region, or taller than 507 rows) and the renderer must fall back to
    # the XLA DDA
    winpack: Optional[object] = None


@jax.jit
def _edit_grid_jit(grid, aux, p, bid, lo, sub):
    """Single-dispatch voxel edit: grid store + aux-box refresh (each
    eager device op pays the ~25 ms dispatch round-trip on the tunneled
    TPU, docs/PERF.md)."""
    grid = grid.at[p[0], p[1], p[2]].set(bid)
    aux = jax.lax.dynamic_update_slice(aux, sub, (lo[0], lo[1], lo[2]))
    return grid, aux


def recenter_boxes(delta, shape, changed, new_origin):
    """Window-recenter refresh boxes, in NEW-window coordinates.

    delta: world shift in voxels (new_origin - old_origin); changed: world
    (lo, hi) boxes whose content differs beyond the pure shift.  Returns
    the list of (lo, hi) boxes whose aux must be recomputed: entered slabs,
    the MAX_SKIP-deep trailing margins (kept distances there must GROW back
    to full-rebuild values), and changed boxes not already covered.  Pure —
    shared by the synchronous path (VoxelScene.update_grid) and the
    background recenter worker (world.chunk_manager)."""
    from wavefront_tpu.render.intersect import MAX_SKIP

    delta = np.asarray(delta)
    shape = np.asarray(shape)
    lo_n = np.maximum(-delta, 0)
    hi_n = shape - np.maximum(delta, 0)
    slabs = []
    covered_lo, covered_hi = lo_n.copy(), hi_n.copy()
    for ax in range(3):
        if delta[ax] > 0:
            s_lo, s_hi = covered_lo.copy(), covered_hi.copy()
            s_lo[ax] = hi_n[ax]
            s_hi[ax] = shape[ax]
            slabs.append((s_lo, s_hi))
            m_lo, m_hi = covered_lo.copy(), covered_hi.copy()
            m_lo[ax] = 0
            m_hi[ax] = min(MAX_SKIP, shape[ax])
            slabs.append((m_lo, m_hi))
        elif delta[ax] < 0:
            s_lo, s_hi = covered_lo.copy(), covered_hi.copy()
            s_lo[ax] = 0
            s_hi[ax] = lo_n[ax]
            slabs.append((s_lo, s_hi))
            m_lo, m_hi = covered_lo.copy(), covered_hi.copy()
            m_lo[ax] = max(shape[ax] - MAX_SKIP, 0)
            m_hi[ax] = shape[ax]
            slabs.append((m_lo, m_hi))
        covered_lo[ax] = 0
        covered_hi[ax] = shape[ax]

    entered = [
        (np.maximum(s_lo, 0), np.minimum(s_hi, shape))
        for s_lo, s_hi in slabs
    ]
    for lo_w, hi_w in changed or ():
        s_lo = np.maximum(np.asarray(lo_w, np.int64) - new_origin, 0)
        s_hi = np.minimum(np.asarray(hi_w, np.int64) - new_origin, shape)
        if any(
            np.all(s_lo >= e_lo) and np.all(s_hi <= e_hi)
            for e_lo, e_hi in entered
        ):
            continue
        slabs.append((s_lo, s_hi))
    return slabs


def shift_refresh_aux(old_aux, grid, transparent, translucent, delta,
                      changed, new_origin):
    """Shifted + box-refreshed aux for a recentered window: the pure host
    compute of update_grid, callable off the frame thread.  Returns
    (aux, dirty_boxes)."""
    from wavefront_tpu.render.intersect import MAX_SKIP, refresh_aux_box

    delta = np.asarray(delta)
    shape = np.asarray(grid.shape)
    new_aux = np.empty_like(old_aux)
    lo_n = np.maximum(-delta, 0)
    hi_n = shape - np.maximum(delta, 0)
    lo_o = lo_n + delta
    hi_o = hi_n + delta
    new_aux[
        lo_n[0]:hi_n[0], lo_n[1]:hi_n[1], lo_n[2]:hi_n[2]
    ] = old_aux[lo_o[0]:hi_o[0], lo_o[1]:hi_o[1], lo_o[2]:hi_o[2]]

    aux = new_aux
    dirty = []
    for s_lo, s_hi in recenter_boxes(delta, shape, changed, new_origin):
        if np.any(s_lo >= s_hi):
            continue
        r_lo = np.maximum(s_lo - MAX_SKIP, 0)
        r_hi = np.minimum(s_hi + MAX_SKIP, shape)
        aux = refresh_aux_box(
            grid, aux, transparent, translucent, r_lo, r_hi, in_place=True,
        )
        dirty.append((r_lo, r_hi))
    return aux, dirty


def _light_arrays(ls: lights_mod.LightSet) -> LightArrays:
    return LightArrays(
        p0=jnp.asarray(ls.p0),
        e1=jnp.asarray(ls.e1),
        e2=jnp.asarray(ls.e2),
        is_tri=jnp.asarray(ls.is_tri),
        area=jnp.asarray(ls.area),
        power=jnp.asarray(ls.power),
        leaf_node=jnp.asarray(ls.leaf_node),
        num_prims=jnp.int32(ls.num_prims),
        node_left=jnp.asarray(ls.node_left),
        node_right=jnp.asarray(ls.node_right),
        node_min=jnp.asarray(ls.node_min),
        node_max=jnp.asarray(ls.node_max),
        node_power=jnp.asarray(ls.node_power),
        node_parent=jnp.asarray(ls.node_parent),
        ancestors=jnp.asarray(ls.ancestors),
        leaf_prim=jnp.asarray(ls.leaf_prim),
        prim_min=jnp.asarray(ls.prim_min),
        prim_max=jnp.asarray(ls.prim_max),
    )


class VoxelScene:
    """Host-side scene: voxel window + entity meshes + lights.

    API parallels the reference Scene (scene.rs:108-507):
      add_object / update_object / remove_object for entities,
      set_grid / set_block for terrain, get_arrays ~ get_tlas.
    """

    def __init__(
        self,
        registry: BlockRegistry,
        grid: np.ndarray,
        grid_origin=(0, 0, 0),
        max_entity_tris: int = 64,
        max_light_prims: int = 1024,
    ):
        self.registry = registry
        self.max_entity_tris = max_entity_tris
        self.max_light_prims = max_light_prims

        self._grid = np.asarray(grid, np.uint8)
        self._grid_origin = np.asarray(grid_origin, np.int32)

        nb = registry.num_blocks
        self._transparent = np.zeros(256, bool)
        self._translucent = np.zeros(256, bool)
        self._luminescent = np.zeros(256, bool)
        self._transparent[: nb + 1] = registry.transparent
        self._translucent[: nb + 1] = registry.translucent
        self._luminescent[: nb + 1] = registry.luminescent
        # blocks beyond the table behave like air
        self._transparent[nb + 1:] = True
        self._translucent[nb + 1:] = True

        self._material_offset = np.zeros((256, 6), np.int32)
        for b in range(nb):
            for f in range(6):
                self._material_offset[b, f] = registry.material_offset(b, f)

        # host-side aux (class+distance) grid cache, kept incrementally
        self._aux: Optional[np.ndarray] = None
        # windowed-tracer incremental builder + its stable slot budget
        # (shapes must not change across edits/recenters: a new shape
        # recompiles the whole frame program)
        self._winbuilder = None
        self._win_budget: Optional[int] = None
        # entity store: id -> (verts (T,3,3), uv (T,3,2), tex (T,))
        self._entities: dict = {}
        self._lights_dirty = True
        self._entities_dirty = True
        self._arrays: Optional[SceneArrays] = None
        self._atlas = jnp.asarray(registry.atlas)
        self._atlas_packed = jnp.asarray(
            np.ascontiguousarray(
                registry.atlas.transpose(0, 2, 3, 1, 4)
            ).reshape(registry.atlas.shape[0], registry.atlas.shape[2],
                      registry.atlas.shape[3], 12)
        )

    # ------ terrain ------

    @property
    def grid(self) -> np.ndarray:
        return self._grid

    @property
    def grid_origin(self) -> np.ndarray:
        return self._grid_origin

    def set_grid(self, grid: np.ndarray, grid_origin) -> None:
        """Replace the whole voxel window (chunk streaming)."""
        self._grid = np.asarray(grid, np.uint8)
        self._grid_origin = np.asarray(grid_origin, np.int32)
        self._aux = None
        self._lights_dirty = True
        self._arrays = None

    def update_grid(self, grid: np.ndarray, grid_origin, changed=None,
                    precomputed=None) -> None:
        """Window update that exploits overlap with the current window.

        changed: optional list of (lo, hi) WORLD-coordinate boxes whose
        content differs from the previous window beyond the pure shift
        (e.g. chunks whose async generation landed this frame); they are
        refreshed like entered slabs.

        precomputed: optional dict from a BACKGROUND recenter worker
        (world.chunk_manager) holding the pure host compute of this update
        done off the frame thread: {"aux", "dirty", "tab", "old_origin"}.
        Adopted only when "old_origin" still matches the live window (an
        intervening edit/recenter invalidates it — the caller then falls
        back to the synchronous path).

        The streaming recenter shifts the window by whole chunks; most of
        its content (and its aux distance field) is unchanged, so instead
        of a full rebuild (reference chunk_manager regenerates every mesh
        it keeps, chunk_manager.rs:165-315):

          * the host aux grid is shifted and refreshed only over ENTERED
            slabs padded by the skip radius (shift_refresh_aux above) —
            distances in kept regions can only have grown;
          * the device grid/aux move by an on-device roll + slab uploads,
            so host->HBM traffic is proportional to the entered content,
            not the window (the TPU analog of the reference's dedicated
            transfer queue, interactive_rendering.rs:96-156).

        Falls back to set_grid when shapes differ or there is no overlap.
        """
        grid = np.asarray(grid, np.uint8)
        new_origin = np.asarray(grid_origin, np.int32)
        shape = np.array(grid.shape)
        if (
            self._aux is None
            or self._grid.shape != grid.shape
            or np.array_equal(new_origin, self._grid_origin)
            and np.array_equal(grid, self._grid)
        ):
            if self._aux is not None and np.array_equal(
                new_origin, self._grid_origin
            ) and np.array_equal(grid, self._grid):
                return  # no-op update
            self.set_grid(grid, new_origin)
            return

        delta = new_origin - self._grid_origin  # world shift in voxels
        if np.any(np.abs(delta) >= shape):
            self.set_grid(grid, new_origin)
            return

        pre_ok = (
            precomputed is not None
            and np.array_equal(
                precomputed.get("old_origin"), self._grid_origin
            )
        )
        if pre_ok and "aux" in precomputed:
            aux, dirty = precomputed["aux"], precomputed["dirty"]
        else:
            aux, dirty = shift_refresh_aux(
                self._aux, grid, self._transparent, self._translucent,
                delta, changed, new_origin,
            )

        self._grid = grid
        self._grid_origin = new_origin
        self._aux = aux
        self._lights_dirty = True

        if self._arrays is not None:
            # device-side shift: roll + upload only the dirty boxes
            dev_grid = jnp.roll(
                self._arrays.grid,
                shift=tuple(int(-d) for d in delta),
                axis=(0, 1, 2),
            )
            dev_aux = jnp.roll(
                self._arrays.aux_grid,
                shift=tuple(int(-d) for d in delta),
                axis=(0, 1, 2),
            )
            for r_lo, r_hi in dirty:
                sl = tuple(
                    slice(int(a), int(b)) for a, b in zip(r_lo, r_hi)
                )
                dev_grid = jax.lax.dynamic_update_slice(
                    dev_grid, jnp.asarray(grid[sl]),
                    tuple(int(x) for x in r_lo),
                )
                dev_aux = jax.lax.dynamic_update_slice(
                    dev_aux, jnp.asarray(aux[sl]),
                    tuple(int(x) for x in r_lo),
                )
            # window pack: window-aligned recenters reuse every kept
            # window's device block (PackBuilder.reshift); anything else
            # falls back to a fresh budget-sticky build.  The host table
            # build (the recenter's dominant cost, docs/PERF.md) comes
            # precomputed when a background worker supplied it.
            winpack = None
            wb = self._winbuilder
            if wb is not None and not np.any(np.asarray(delta) % 32):
                if pre_ok and "tab" in precomputed:
                    new_tab = precomputed["tab"]
                else:
                    from wavefront_tpu.kernels.window_trace import (
                        build_window_tables,
                    )

                    new_tab = build_window_tables(
                        self._grid, self._transparent, self._translucent
                    )
                dwin = (delta[1] // 32, delta[0] // 32, delta[2] // 32)
                if new_tab is not None and wb.reshift(new_tab, dwin):
                    winpack = wb.pack
            if winpack is None:
                winpack = self._build_winpack(
                    tab=precomputed.get("tab") if pre_ok else None
                )
            self._arrays = self._arrays._replace(
                grid=dev_grid,
                aux_grid=dev_aux,
                grid_origin=jnp.asarray(new_origin),
                winpack=winpack,
            )
            # lights still rebuild on host (emitters may have streamed in)
            self._refresh_lights_in_arrays()

    def set_block(self, world_pos, block_id: int) -> None:
        """Incremental block edit (the reference re-meshes the chunk and
        rebuilds BLAS+TLAS, chunk_manager.rs:331-392; here: one voxel store,
        a local distance-field refresh, and a light rebuild only when an
        emissive block is involved)."""
        from wavefront_tpu.render.intersect import update_aux_region

        p = np.asarray(world_pos, np.int64) - self._grid_origin
        if np.any(p < 0) or np.any(p >= np.array(self._grid.shape)):
            return
        old = int(self._grid[tuple(p)])
        self._grid = self._grid.copy()
        self._grid[tuple(p)] = block_id
        # light set changes iff an emissive block appears/disappears next to
        # the edit; conservatively: if either old or new block is luminescent
        # or any neighbor is luminescent
        lum = self._luminescent
        neigh = []
        for ax in range(3):
            for s in (-1, 1):
                q = p.copy()
                q[ax] += s
                if np.all(q >= 0) and np.all(q < np.array(self._grid.shape)):
                    neigh.append(self._grid[tuple(q)])
        lights_touched = (
            lum[old] or lum[block_id] or any(lum[b] for b in neigh)
        )
        if lights_touched:
            self._lights_dirty = True

        if self._aux is not None:
            self._aux = update_aux_region(
                self._grid, self._aux, self._transparent, self._translucent, p
            )
        if self._arrays is not None and self._aux is not None:
            # surgical device update: single grid voxel + the aux subregion
            # + an incremental winpack edit (one window's masks/palette and
            # at most one band skip plane — PackBuilder.set_block; ADVICE
            # round 1: no more full O(window) rebuild per edit)
            import jax
            from wavefront_tpu.render.intersect import MAX_SKIP

            # FIXED-size update box (clamped inside the grid): a varying
            # slice shape would compile a fresh dynamic_update_slice
            # program per edit position (~90 ms each, measured)
            shape = np.array(self._grid.shape)
            box = np.minimum(2 * MAX_SKIP + 1, shape)
            lo = np.clip(p - MAX_SKIP, 0, shape - box)
            hi = lo + box
            sub = jnp.asarray(
                self._aux[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]]
            )
            wb = self._winbuilder
            if wb is not None and wb.set_block(
                self._grid, p, old, int(block_id),
                self._transparent, self._translucent,
            ):
                winpack = wb.pack
            else:
                winpack = self._build_winpack()
            new_grid, new_aux = _edit_grid_jit(
                self._arrays.grid, self._arrays.aux_grid,
                jnp.asarray(p, jnp.int32), jnp.uint8(block_id),
                jnp.asarray(lo, jnp.int32), sub,
            )
            self._arrays = self._arrays._replace(
                grid=new_grid, aux_grid=new_aux, winpack=winpack,
            )
            if lights_touched:
                # emissive change: rebuild only the light set in place
                self._refresh_lights_in_arrays()
        else:
            self._arrays = None

    def get_block(self, world_pos) -> int:
        p = np.asarray(world_pos, np.int64) - self._grid_origin
        if np.any(p < 0) or np.any(p >= np.array(self._grid.shape)):
            return self.registry.air
        return int(self._grid[tuple(p)])

    # ------ entities (reference scene.rs:150-232) ------

    def add_object(self, key, verts: np.ndarray, uv: np.ndarray, tex: np.ndarray,
                   transform: Optional[np.ndarray] = None) -> None:
        """Add a triangle mesh entity.

        verts: (T,3,3) object-space vertices; uv: (T,3,2); tex: (T,) texture
        slots; transform: optional (4,3)-style [R|t] affine (stored applied).
        """
        self._entities[key] = (
            np.asarray(verts, np.float32),
            np.asarray(uv, np.float32),
            np.asarray(tex, np.int32),
            np.eye(4, dtype=np.float32)[:3] if transform is None else np.asarray(transform, np.float32),
        )
        self._entities_dirty = True
        self._lights_dirty = True
        self._arrays = None

    def update_object(self, key, transform: np.ndarray) -> None:
        """Move an entity.  Incremental: a transform touches only the
        fixed-capacity triangle pool (and the light set when the entity is
        emissive) — the grid/aux/winpack device arrays are untouched, so a
        kinematic entity moving every frame (the app's ego cube,
        main.rs:99-114) costs one small pool upload, not a full
        get_arrays() rebuild (the old path re-uploaded the whole grid and
        rebuilt the light BVH per frame: ~1.3 s/frame in the app loop)."""
        v, u, t, _ = self._entities[key]
        self._entities[key] = (v, u, t, np.asarray(transform, np.float32))
        if self._arrays is None:
            self._entities_dirty = True
            self._lights_dirty = True
            return
        verts, uv, tex, active = self._entity_pool()
        self._arrays = self._arrays._replace(
            tri_verts=jnp.asarray(verts),
            tri_uv=jnp.asarray(uv),
            tri_tex=jnp.asarray(tex),
            tri_active=jnp.asarray(active),
        )
        lum = self.registry.luminance
        if (lum[np.clip(t, 0, len(lum) - 1)] > 0).any():
            # the MOVED entity emits: the light set must follow it
            # (other emitters are unaffected by this transform)
            self._refresh_lights_in_arrays()

    def remove_object(self, key) -> None:
        if key in self._entities:
            del self._entities[key]
            self._entities_dirty = True
            self._lights_dirty = True
            self._arrays = None

    def _entity_pool(self):
        cap = self.max_entity_tris
        verts = np.zeros((cap, 3, 3), np.float32)
        uv = np.zeros((cap, 3, 2), np.float32)
        tex = np.zeros(cap, np.int32)
        active = np.zeros(cap, bool)
        k = 0
        for key in sorted(self._entities.keys(), key=str):
            v, u, t, m = self._entities[key]
            if m.shape[1] == 4:
                r, tr = m[:, :3], m[:, 3]
            else:
                r, tr = m, np.zeros(3, np.float32)
            world = v @ r.T + tr
            n = len(v)
            if k + n > cap:
                raise ValueError(
                    f"entity triangle budget exceeded ({k + n} > {cap})"
                )
            verts[k : k + n] = world
            uv[k : k + n] = u
            tex[k : k + n] = t
            active[k : k + n] = True
            k += n
        return verts, uv, tex, active

    def _emissive_entity_tris(self, verts, tex, active):
        lum = self.registry.luminance
        t = tex[active]
        v = verts[active]
        mask = lum[np.clip(t, 0, len(lum) - 1)] > 0
        if not mask.any():
            return np.zeros((0, 3, 3), np.float32), np.zeros(0, np.float32)
        tv = v[mask]
        e1 = tv[:, 1] - tv[:, 0]
        e2 = tv[:, 2] - tv[:, 0]
        area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)
        power = lum[t[mask]] * area
        return tv, power.astype(np.float32)

    # ------ arrays (reference get_tlas, scene.rs:234-497) ------

    def _refresh_lights_in_arrays(self) -> None:
        """Rebuild only the light set of live device arrays (streaming
        keeps grid/aux on device; emitters may have entered the window)."""
        verts, uv, tex, active = self._entity_pool()
        tv, tp = self._emissive_entity_tris(verts, tex, active)
        light_set = lights_mod.build_from_grid(
            self._grid,
            self._grid_origin,
            self.registry,
            self.max_light_prims,
            extra_tris=(tv, tp),
        )
        self._arrays = self._arrays._replace(lights=_light_arrays(light_set))
        self._lights_dirty = False

    def get_arrays(self) -> SceneArrays:
        """Assemble/refresh the device pytree; rebuilds only dirty pieces."""
        if self._arrays is not None:
            return self._arrays

        verts, uv, tex, active = self._entity_pool()
        tv, tp = self._emissive_entity_tris(verts, tex, active)
        light_set = lights_mod.build_from_grid(
            self._grid,
            self._grid_origin,
            self.registry,
            self.max_light_prims,
            extra_tris=(tv, tp),
        )

        from wavefront_tpu.render.intersect import make_aux_grid

        if self._aux is None:
            self._aux = make_aux_grid(
                self._grid, self._transparent, self._translucent
            )
        self._arrays = SceneArrays(
            grid=jnp.asarray(self._grid),
            aux_grid=jnp.asarray(self._aux),
            grid_origin=jnp.asarray(self._grid_origin),
            transparent=jnp.asarray(self._transparent),
            translucent=jnp.asarray(self._translucent),
            luminescent=jnp.asarray(self._luminescent),
            material_offset=jnp.asarray(self._material_offset),
            atlas=self._atlas,
            atlas_packed=self._atlas_packed,
            tri_verts=jnp.asarray(verts),
            tri_uv=jnp.asarray(uv),
            tri_tex=jnp.asarray(tex),
            tri_active=jnp.asarray(active),
            lights=_light_arrays(light_set),
            winpack=self._build_winpack(),
        )
        self._lights_dirty = False
        self._entities_dirty = False
        return self._arrays

    def _build_winpack(self, tab=None):
        """Windowed-tracer tables for the current grid (None if out of
        range — the renderer then falls back to dda_trace).  The unique-
        block budget is sticky across rebuilds so streamed recenters keep
        the device shapes (and the compiled frame program) stable.
        tab: optional precomputed WindowTables for the CURRENT grid."""
        from wavefront_tpu.kernels.window_trace import (
            PackBuilder,
            build_window_tables,
        )

        if tab is None:
            tab = build_window_tables(
                self._grid, self._transparent, self._translucent
            )
        if tab is None:
            self._winbuilder = None
            return None
        self._winbuilder = PackBuilder(tab, nu_budget=self._win_budget)
        self._win_budget = self._winbuilder.budget
        return self._winbuilder.pack
