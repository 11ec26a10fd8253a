"""Engine configuration.

The reference scatters its configuration over compile-time constants
(num_bounces/scale: interactive_rendering.rs:652-653, chunk size: chunk.rs:13-15,
load/evict radii: chunk_manager.rs:29-37, window size: main.rs:801) and a
runtime-togglable `RenderingPreferences` struct (camera.rs:37-58).  Here both
are promoted into real dataclasses, per SURVEY.md section 5 (config).

`RenderSettings` fields are static (they determine traced shapes and compiled
code); `RenderingPreferences` fields are runtime values fed to the jitted step
as traced scalars, so toggling them does not recompile.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass


# Ray-march epsilon, mirrors EPSILON_BLOCK in the trace kernel
# (reference raytrace.rs:16).  The nee_pdf kernel uses a smaller epsilon
# (reference nee_pdf.rs:15); both are kept distinct below.
EPSILON_BLOCK = 1e-3
EPSILON_NEE = 1e-4

# Maximum ray parameter, mirrors t_max in getIntersectionInfo
# (reference raytrace.rs:368).
T_MAX = 1000.0

# Distance that missed rays are propelled to (reference raytrace.rs:529).
MISS_DISTANCE = 5000.0

# Sky: emissivity 50 iff direction . (0,1,0) > 0.9 (reference raytrace.rs:532).
SKY_EMISSION = 50.0
SKY_COS_CUTOFF = 0.9

# Emission texture scale (reference raytrace.rs:585).
EMISSION_SCALE = 1000.0

# Probability of sampling the light (vs the BSDF) when the light-BVH descent
# succeeds: one-sample MIS weight (reference raytrace.rs:622).
NEE_MIS_WEIGHT = 0.3


@dataclass(frozen=True)
class RenderSettings:
    """Static renderer geometry; a change here triggers a re-jit.

    Mirrors the constants baked into the reference Renderer
    (interactive_rendering.rs:652-653 and the swapchain extent).
    """

    width: int = 1024
    height: int = 1024
    num_bounces: int = 6
    # supersampling factor: rays are traced at (width*scale, height*scale)
    # and box-filtered down (reference postprocess.rs:33-76, scale field
    # interactive_rendering.rs:652).
    scale: int = 1
    # Maximum DDA steps for the primary intersector.  Bounds the while-loop
    # trip count; rays that exhaust it report a miss.  3*extent covers the
    # worst-case corner-to-corner walk of the grid.
    max_trace_steps: int = 256
    # Maximum light-prim crossings per ray collected by the NEE-pdf sweep's
    # SPARSE path (large light sets only; the dense path accumulates every
    # crossing exactly, like the reference nee_pdf.rs:302-334).
    max_nee_hits: int = 8
    # Maximum depth of the light BVH descent / reverse walk.
    max_bvh_depth: int = 32
    # Maximum number of dynamic (non-voxel) entity triangles intersected
    # brute-force each bounce.  The reference supports arbitrary meshes via
    # hardware BLAS; on TPU dynamic meshes are a fixed-budget vectorized
    # ray-triangle test (the default scene has one 12-triangle ego cube).
    max_entity_tris: int = 64
    # (A standalone Pallas entity-sweep kernel existed through two rounds
    # without ever beating the XLA broadcast sweep at any realistic entity
    # count — the (N, <=64)-triangle test is a trivially fused broadcast
    # XLA already schedules well.  Deleted per VERDICT r1 #8.)
    # Sub-pixel jitter amplitude in pixels (0 = reference behavior,
    # raygen.rs:108-111; combine with temporal accumulation for AA).
    jitter: float = 0.0
    # Terminal-ray compaction: between bounces, sort alive rays to the
    # front and dispatch the shading pipeline on the smallest power-of-two
    # prefix bucket that holds them (full / half / quarter).  The TPU
    # analog of the reference's wavefront queue compaction.
    compaction: bool = False
    # Primary-hit caching: when the camera and scene are unchanged between
    # frames (temporal accumulation), reuse bounce-0 intersections —
    # they are seed-independent; only the shading RNG advances.
    cache_primary: bool = False
    # Voxel intersector selection: True = fused windowed Pallas tracer
    # (kernels/window_trace.py), False = XLA DDA, None = auto (windowed
    # tracer on TPU when the scene pack exists, DDA elsewhere — interpret-
    # mode Pallas is far too slow for the CPU test path).
    use_column_trace: "bool | None" = None
    # Sort rays by direction/origin coherence inside the column tracer
    # (multi-operand lax.sort in, inverse sort out — image-invariant).
    # Cuts the per-tile straggler time of incoherent bounce rays.
    trace_presort: bool = True
    # Event budget per TILE for the windowed tracer (window visits within
    # a tile serialize, so this is NOT a per-ray bound like
    # max_trace_steps).  0 = auto: derived from the scene's window-grid
    # extent (window_trace.auto_events).  The trace loop exits as soon as
    # every lane terminates, so a generous budget costs nothing on easy
    # tiles; rays that exhaust it report a miss WITH a truncation flag
    # asserted ~zero by tools/tpu_parity.py.
    trace_events: int = 0
    # Resident 32^3 windows per trace event (kernels/window_trace.py).
    # >1 widens the one-hot contraction so divergent (secondary-bounce)
    # tiles march ~k x more lanes per event at an MXU cost that scales
    # with k.  Measured (docs/PERF.md): k=4 gains only ~4% on hemisphere
    # fans but costs 18% on coherent primaries -> default 1.
    trace_windows: int = 1
    # Phased tracing (straggler compaction): phases-1 short passes of
    # trace_phase_events each, re-sorting truncated rays by their CURRENT
    # position between passes so stragglers pack into dense tiles, then a
    # final full-budget pass.  1 = single-shot.  Requires trace_presort.
    # Measured: the inter-phase multi-operand sort tax ~= the straggler
    # win at 1M rays (docs/PERF.md) -> default single-shot.
    trace_phases: int = 1
    trace_phase_events: int = 64
    # Bounce indices that trace PHASED (with trace_phases/
    # trace_phase_events); every other bounce runs single-shot.  Empty =
    # legacy behavior (trace_phases applies to all bounces).  Rationale
    # (docs/PERF.md): the straggler win lives almost entirely in the first
    # diffuse bounce (hemisphere fan, tile mean 42 events vs per-lane mean
    # 4.6) while the inter-phase sorts cost ~28 ms on EVERY phased bounce —
    # phasing only bounce 1 keeps the win and drops 3/4 of the sort tax.
    # Scheduled bounces run unrolled (outside the bounce lax.scan), so each
    # distinct entry adds one bounce-body to the compiled program.
    trace_phases_at: tuple = ()
    # Resident-window count for the SCHEDULED (trace_phases_at) bounces
    # only; 0 = use trace_windows.  Multi-residency multiplies marching
    # occupancy on divergent diffuse fans at one extra extraction matmul
    # per extra window — a trade that flips as the event gets cheaper
    # (docs/PERF.md roofline).
    trace_windows_hot: int = 0
    # Rays per kernel tile (rounded to whole 128-lane rows).  Bigger tiles
    # amortize VPU op issue across more vregs; smaller tiles cut straggler
    # serialization.  Sweep with tools/trace_tune.py.
    trace_tile: int = 1024
    # Empty-space skips (per-band in-plane + whole-window) inside the
    # windowed tracer.  False statically elides the skip candidate math
    # from every event — leaner events, more of them; dense volumetric
    # worlds rarely skip (docs/PERF.md), so the trade can win there.
    trace_skips: bool = True
    # Whole-window (32^3 L-inf ball) skips specifically — a subset of
    # trace_skips.  They only fire when the scene has fully-empty windows
    # (pack.max_wdist >= 1) but add candidate math to every event; dense
    # worlds with a few empty windows can win by eliding just these while
    # keeping the per-band in-plane skips.
    trace_wskip: bool = True
    # Events per inner while-loop iteration in the windowed tracer.  Each
    # iteration pays a vector->scalar sync (the marching-lane count feeding
    # the loop condition); unrolling amortizes it at the cost of up to
    # unroll-1 fully-masked (wasted) events per tile.
    trace_unroll: int = 1
    # Lean/full event alternation over the unrolled copies: only copies
    # j % stride == 0 carry the empty-space-skip candidate math (and its
    # band channels in the z-select).  A skipped opportunity costs one
    # cheap event, never correctness.  1 = every copy full (legacy);
    # only meaningful with trace_unroll > 1.
    trace_skip_stride: int = 1
    # (a trace_owner_gather knob — resolve hit owners with a post-kernel
    # dense-grid gather — was measured a 28 ms loser on the headline,
    # 2026-08-19, and removed in round 4; the in-kernel hoisted-mask
    # owner loop is the only path)
    # Exhaustive-traversal audit: additionally count, per frame, rays that
    # exhausted the windowed tracer's event budget (reported as misses with
    # the truncation flag).  The kernel is unchanged — only a scalar
    # reduction is added — so the audited program is the benchmark program.
    # tools/tpu_parity.py --bench asserts this count is 0 at the headline
    # budget: the TPU analog of the reference's exact hardware traversal
    # guarantee (raytrace.rs:366-400).
    trace_audit: bool = False
    # Fused Pallas shade (kernels/shade.py): texel fetch, murmur3 scatter,
    # dense NEE sampling, the NEE pdf sweep, and the throughput/radiance
    # update run as ONE kernel over the tracer's sorted tiles — per-ray
    # state crosses HBM once per bounce instead of five stitched XLA
    # stages (Phase B, docs/PERF.md).  None = auto: on for TPU backends
    # when the scene qualifies (no dynamic entities; dense light set
    # within the kernel's SMEM caps); off elsewhere, falling back to the
    # XLA shade below.  Selects/murmur3/texel math are bit-exact vs the
    # XLA path; NEE descent probabilities can differ by ULPs
    # (tests/test_shade_fused.py pins image parity by tolerance).
    shade_fused: "bool | None" = None
    # Bounce indices at which the inter-bounce multi-operand sort (and the
    # compaction bucket RE-measure) runs; None = every bounce (legacy).
    # Skipped bounces trace in the PREVIOUS sorted order: deadness is
    # monotonic, so the dead tail from the last sorted bounce only grows
    # holes — the compaction bucket covers the last alive SLOT instead of
    # the alive count and results are bit-identical (per-ray outputs are
    # order-independent).  Rationale (docs/PERF.md): the 14-operand sort
    # network costs ~12 ms/bounce at 2M rays while late-bounce coherence
    # decays slowly — hit points of a sorted tile stay window-clustered —
    # so re-sorting every bounce can cost more than the stale order does.
    # Non-empty schedules run the bounce loop unrolled (static per-bounce
    # program), like trace_phases_at.
    sort_bounces: "tuple | None" = None
    # Fetch shade texels with the Pallas one-hot-matmul kernel
    # (kernels/texel.py) instead of the XLA gather
    # `atlas_packed[tex,tj,ti]`.  The gather is a 2M-row random fetch of
    # 48 B slices (~43 ms/bounce at the headline, tools/stage_table.py
    # `notex`); the kernel serializes over DISTINCT TEXTURES per sorted
    # tile, not rays.  Bit-exact (exact f32 one-hot extraction).
    shade_texel_kernel: bool = True
    # bf16 color pipeline: texel/reflectivity/emissivity/throughput math
    # runs in bfloat16 (2x VPU lanes for the shade soup); radiance
    # ACCUMULATES in f32, geometry stays f32.  Golden parity configs keep
    # this off (tests/test_batch.py pins the quality bound).
    shade_bf16: bool = False
    # Stage-isolation TIMING variants (tools/stage_table.py; they change
    # the image and exist only to attribute frame time):
    #   ""          production
    #   "freetrace" replace the voxel trace with a synthetic constant hit
    #               (every ray alive every bounce) -> the frame time IS
    #               the non-trace floor, upper-bounded
    #   "notex"     constant texel instead of the atlas gather
    #   "nonee_pdf" NEE sampling runs but the pdf sweep returns zeros
    debug_stage: str = ""

    @property
    def render_width(self) -> int:
        return self.width * self.scale

    @property
    def render_height(self) -> int:
        return self.height * self.scale

    @property
    def n_rays(self) -> int:
        return self.render_width * self.render_height

    def replace(self, **kw) -> "RenderSettings":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class RenderingPreferences:
    """Runtime-togglable preferences (reference camera.rs:37-58).

    nee_type: 0 = BSDF sampling only, 1 = NEE on every bounce,
              2 = NEE on first bounce only (reference raytrace.rs:614).
    debug_view: postprocess shows the debug buffer instead of radiance
              (reference postprocess.rs:59-63).
    sort_type: 0 = no inter-bounce ray sort, 1 = morton-key sort
              (the reference's sort machinery with the morton path enabled;
              reference raytrace.rs:687-693 computes identity keys with the
              morton helpers commented out — here sort_type=1 actually sorts).
    """

    nee_type: int = 0
    debug_view: int = 0
    sort_type: int = 0
    should_screenshot: bool = False

    def replace(self, **kw) -> "RenderingPreferences":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class WorldSettings:
    """Voxel world geometry (reference chunk.rs:13-15, chunk_manager.rs:29-37)."""

    chunk_size: int = 32
    # chunks within this radius (in chunk units, chebyshev) of the ego chunk
    # are loaded...
    load_radius: int = 6
    # ...and evicted beyond this radius.
    evict_radius: int = 8
    # worldgen parameters (reference chunk.rs:70-104)
    noise_scale: float = 20.0
    noise_threshold: float = 0.2
    depth_gradient: float = 50000.0
    worldgen_seed: int = 0
    # the hard-coded central lamp cube: every voxel with |wx|,|wy|,|wz| < 3
    # becomes a lamp (reference chunk.rs:102-104).
    central_lamp: bool = True

    def replace(self, **kw) -> "WorldSettings":
        return dataclasses.replace(self, **kw)
