"""Typed configuration tree for the whole system.

Single source of truth replacing the reference's two-tier config (gflags CLI +
per-dataset YAML via cv::FileStorage, reference: src/DenseSLAM/SystemEntry.cpp:
12-33 and 136-199) and the per-subsystem param structs
(reference: src/DenseSLAM/VoxelDecayParams.h:7-64). Every field that shapes an
array is a static python int so configs hash into jit caches.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

from .utils.camera import Intrinsics, StereoRig


@dataclasses.dataclass(frozen=True)
class VoxelDecayParams:
    """reference: src/DenseSLAM/VoxelDecayParams.h:7-17"""
    enabled: bool = False
    min_decay_age: int = 30
    max_decay_weight: int = 2


@dataclasses.dataclass(frozen=True)
class SlideWindowParams:
    """reference: src/DenseSLAM/VoxelDecayParams.h:19-27"""
    enabled: bool = False
    max_age: int = 60


@dataclasses.dataclass(frozen=True)
class OnlineCorrectionParams:
    """reference: src/DenseSLAM/VoxelDecayParams.h:29-36"""
    enabled: bool = False
    correction_num: int = 5          # how many worst-drift keyframes to re-fuse
    start_correction_num: int = 10   # min stale keyframes before acting
    min_error: float = 0.015         # drift threshold to consider stale
    # Coarser gate for INACTIVE submaps: their content is final map
    # geometry whose rigid drift the inter-submap alignment delta absorbs
    # at composite time, so only loop-scale pose jumps are worth a
    # deferred de-fuse/re-fuse replay (each one dirties the pool and
    # costs a spill/restore round trip over the host boundary).
    inactive_min_error: float = 0.05


@dataclasses.dataclass(frozen=True)
class PostProcessParams:
    """Depth post-processing by cross-frame consistency
    (reference: src/DenseSLAM/VoxelDecayParams.h:38-46, DenseSlam.cpp:434-552).
    """
    enabled: bool = False
    filter_threshold: float = 0.1    # relative depth disagreement
    filter_area: float = 0.5         # lower fraction of image rows filtered


@dataclasses.dataclass(frozen=True)
class WeightParams:
    """Depth-dependent fusion weighting
    (reference: src/DenseSLAM/SystemEntry.cpp:183-187 WeightParams)."""
    depth_weighting: bool = False
    max_new_w: int = 5
    max_distance: float = 30.0


@dataclasses.dataclass(frozen=True)
class TsdfConfig:
    """Voxel-hashed TSDF volume geometry + table capacities (static)."""
    voxel_size_m: float = 0.06
    trunc_dist_m: float = 0.24               # mu; typically 4 * voxel
    max_weight: float = 100.0                # ITMLibSettings sceneParams.maxW
    table_slots: int = 1 << 15               # hash table capacity (slots)
    probe_len: int = 16                      # max linear probes
    max_visible_blocks: int = 4096           # static cap on visible set
    max_alloc_per_frame: int = 4096          # static cap on new blocks/frame
    min_depth_m: float = 0.3
    max_depth_m: float = 50.0
    raycast_steps: int = 192                 # bounded DDA steps per ray
    # Depth sampling during fusion: nearest (1 gather/voxel, what ITM does)
    # vs edge-guarded bilinear (4 gathers; sharper at depth discontinuities
    # but ~4x the gather cost on TPU).
    bilinear_fusion: bool = False
    # Pixel stride for the allocation pass (touched-block keys). Blocks are
    # 8 voxels wide, so at stride 2 a 50 m-range block still projects to
    # >=3 px and cannot be missed; the dedupe sorts shrink by stride^2.
    alloc_subsample: int = 1
    # Fuse voxel color (ITMVoxel_s_rgb) or depth-only (ITMVoxel_s) — color
    # costs one extra image gather + a table row r/m/w per frame.
    fuse_color: bool = True
    # Pack depth (16-bit mm) + luminance (8-bit) into ONE int32 image so
    # fusion does a single element-granular gather instead of two (the
    # element gathers are fusion's dominant cost — ~15-30 ns/element).
    # Valid when the fused color is luminance (the pipeline fuses the gray
    # left image; r==g==b) and bilinear_fusion is off; set False to fuse
    # true RGB with a separate color gather.
    gray_color_fusion: bool = True
    # Fusion image sampling backend: "gather" = XLA computed-index gather
    # (~7-10 ns/element floor => ~32 ms/frame at KITTI scale), "pallas" =
    # per-block image-tile DMA kernel (ops/sampling.py) with an XLA-gather
    # fallback for near-field blocks whose footprint exceeds the tile.
    sampler: str = "gather"
    pallas_overflow_cap: int = 512    # compacted fallback block budget
    # Pool storage dtype for tsdf + weight planes: "float32" or "bfloat16".
    # bf16 halves the pool's HBM row traffic (integrate reads+writes both
    # planes every frame); math still runs in f32 (upcast on load). TSDF
    # quantisation at bf16 is ~0.4% of the truncation band (~1 mm at 24 cm
    # mu) — below stereo depth noise.
    storage_dtype: str = "float32"
    weights: WeightParams = WeightParams()

    @property
    def block_size_m(self) -> float:
        return self.voxel_size_m * 8.0


@dataclasses.dataclass(frozen=True)
class FrontendConfig:
    """Sparse frontend: feature extraction, matching, RANSAC VO."""
    # Feature budget. 2048 (with 8/bucket) doubles the VO inlier support
    # vs 1024/4 on the flagship drive (median 85 -> 201 inliers) and cuts
    # per-frame motion error ~40%; the wider support also shrinks the
    # noise-induced estimator bias (-1.37% -> -0.55% of the per-frame
    # step) that made open-loop drift stack-dependent (ROADMAP round-4
    # VO-numerics investigation). O(N^2) match matrices stay tiny MXU
    # work at this size.
    max_features: int = 2048          # static cap after bucketing
    # Feature stack selection: "gradient" (libviso2-style filter-bank
    # descriptors, the stereo-VO default) or "orb" (oriented FAST +
    # steered BRIEF, the reference backend's currency — ORB-SLAM2 fork,
    # reference: DenseSlam.h:376-380). Both flow through the same MXU
    # matching/BA/retrieval programs: ORB's 256-bit descriptors are
    # expressed as +-1/16 float vectors so squared-L2 == Hamming/64.
    feature_type: str = "gradient"
    orb_levels: int = 3               # ORB pyramid levels
    orb_thresh: float = 18.0          # FAST threshold
    nms_radius: int = 4
    nms_tau: float = 25.0             # detector response threshold
    bucket_w: int = 50                # bucketing cell size, px
    bucket_h: int = 50
    max_per_bucket: int = 8
    match_radius_px: float = 100.0    # spatial gate for matching
    stereo_band_px: float = 3.0       # epipolar band for L/R matching
    # Motion-prior (warm-start) matching: gate temporal matches around the
    # previous features' positions PREDICTED by the last inter-frame motion
    # + per-feature stereo depth (reference: Tr_delta-guided search,
    # viso_stereo.cpp:53-57 / matcher computePriorStatistics stage 2).
    use_motion_prior_gate: bool = True
    predictive_gate_px: float = 24.0
    # Neighbourhood flow-consensus outlier removal — the TPU analogue of
    # the reference's Delaunay-neighbourhood match filter
    # (reference: src/libviso2/src/matcher.cpp:1212-1382; tolerances mirror
    # matcher params outlier_flow_tolerance / outlier_disp_tolerance = 5).
    outlier_removal: bool = True
    outlier_knn: int = 8
    outlier_flow_tol_px: float = 5.0
    outlier_disp_tol_px: float = 5.0
    outlier_min_support: int = 2
    # Running exposure compensation from matched-patch gain estimation
    # (reference: src/libviso2/src/matcher.cpp:291-333) — images are
    # corrected by the accumulated gain before feature extraction.
    gain_normalization: bool = True
    ransac_iters: int = 256           # hypotheses, batched via vmap
    # libviso2 refit reweighting: centre features weigh more
    # (reference: viso_stereo.cpp:327-331; reference default on)
    edge_reweighting: bool = True
    ransac_thresh_px: float = 2.0     # reference: viso_stereo.h:39-41
    gn_iters: int = 8
    refine_iters: int = 12
    # Subpixel match refinement by direct patch correlation on the raw
    # images (the reference's post-match parabolic refinement,
    # matcher.cpp:1384-1588). Re-anchors every quad corner to the same
    # physical surface patch — kills detector peak-locking noise, the
    # dominant VO error term on the drive (flow-u sigma 1.26 -> ~0.4 px).
    subpixel_refine: bool = True
    refine_patch: int = 9             # correlation window (odd)
    refine_search: int = 2            # +- integer search around the match
    refine_cap: int = 384             # max quads refined per frame (valid
                                      # rows are compacted first; measured
                                      # post-consensus valid counts on the
                                      # loop drive are median 154 / p95 261
                                      # (exp_refine_gate.py) — 384 covers
                                      # them with margin at half the old
                                      # 768 budget, bit-identical output)
    # Which quad legs the patch-correlation refinement re-anchors:
    #   "full"     — all three legs (rp, lc, rc), the maximum-accuracy
    #                form the round-4 hardening shipped;
    #   "temporal" — the scale-anchored lc leg only; the stereo partners
    #                keep their detector positions. The temporal leg is
    #                where the scale-bias mechanism lives (predicted-scale
    #                anchor, see refine_quad_subpix); stereo-leg detector
    #                noise is zero-mean disparity noise that the ~200-
    #                inlier refit averages down. Measured on the 150-frame
    #                open-loop probe (exp_refine_gate.py): ATE 0.073 vs
    #                full's 0.100, end-drift 0.079 vs 0.111 (equal or
    #                better) at ~45% of the refinement gathers.
    refine_mode: str = "temporal"
    # Monocular scale fixing (reference: libviso2 viso_mono — scale from
    # the calibrated camera height over the ground plane; KITTI-ish
    # defaults).
    camera_height_m: float = 1.65
    camera_pitch_rad: float = 0.0
    # PD controller on the feature budget
    # (reference: src/DenseSLAM/DenseSlam.h:382-409,486-489)
    pd_kp: float = 0.8
    pd_kd: float = 0.08
    target_frame_ms: float = 100.0


@dataclasses.dataclass(frozen=True)
class StereoConfig:
    max_disparity: int = 128
    patch_radius: int = 3
    sgm_p1: float = 8.0
    sgm_p2: float = 96.0
    lr_check_px: float = 1.5
    # Uniqueness gate on the RAW (pre-aggregation) cost at the SGM winner:
    # reject pixels where raw_cost[winner] > uniq_ratio * min(raw_cost
    # outside +-2 lanes). Texture-poor surfaces — in particular objects
    # CLOSER than the rig's resolvable floor fx*b/max_disparity, whose true
    # disparity is outside the search range — produce flat raw cost and a
    # confident-but-wrong SGM match that the LR check cannot catch (both
    # views agree on the same self-similar mismatch). Measured on the
    # long-drive's frame-400 close-occluder failure: thr 0.9 rejects 99.7%
    # of >50%-error pixels at 1.7% of good ones. 0 disables.
    uniq_ratio: float = 0.9
    use_sgm: bool = True
    # cost-volume dtype for the SGM aggregation passes. "bfloat16" halves
    # the HBM traffic of the dominant full-volume scans (the volume is
    # 232 MB at KITTI res in f32); WTA/subpixel still read the aggregated
    # volume in its storage dtype, so subpixel precision degrades slightly
    # (measure with eval/depth_metrics before flipping a deployment).
    cost_dtype: str = "float32"
    # "pallas": path aggregation as pallas kernels (ops/sgm_pallas.py) —
    # one call per direction with a persistent VMEM carry, accumulating
    # in place (no border copies, no separate 4-way sum pass). "xla":
    # the lax.scan formulation.
    sgm_backend: str = "xla"


@dataclasses.dataclass(frozen=True)
class BackendConfig:
    """Local BA + pose graph capacities (static)."""
    window_keyframes: int = 8
    max_landmarks: int = 1024
    max_obs_per_landmark: int = 8
    ba_iters: int = 12
    huber_px: float = 2.0
    outlier_px: float = 5.0   # chi2 gate between BA rounds
    pg_iters: int = 20
    max_pg_nodes: int = 256
    max_pg_edges: int = 512
    # loop-retrieval signature buffer capacity (device-resident sketch
    # stack scored by one chunked MXU matmul per detect_loop/relocalize;
    # host scoring is O(K) GFLOPs and ~seconds at 1k+ keyframes). Must be
    # a multiple of 128.
    retrieval_capacity: int = 2048


@dataclasses.dataclass(frozen=True)
class SplatParams:
    """Forward-splat renderer caps (ops/splat.py) — the TPU-native fast
    rendering path; see the module docstring for why marching is slow.

    surface_eta=0.8 (was 0.3): at grazing incidence (street ground beyond
    ~8 m) the |tsdf|<0.3 band thins below one splat per 8 px and the
    renderer lost 15% coverage with 0.55 m p95 error vs the exact
    raycaster; widening the band restores full coverage and p95 ~3 voxels
    (measured in tests/test_splat_tails.py).

    max_blocks=4096 (was 2048): a full-res KITTI street frustum holds
    ~4.9k allocated blocks; at 2048 the visible-set sort silently drops an
    arbitrary subset (measured: coverage 0.37 -> 0.48, MAE 0.55 -> 0.36 m
    on a 48-frame full-res street map) and the packed-key z-buffer made
    4096 cost only +1.3 ms (19.6 vs 18.3 ms/frame on TPU v5e)."""
    max_blocks: int = 4096
    max_voxels: int = 1 << 19
    surface_eta: float = 0.8
    z_bits: int = 12
    fill_levels: int = 3
    # occlusion-aware fill: override hits more than up*(1+rel)+abs behind
    # the min-pooled neighbourhood (background bleed-through between a
    # near surface's point splats — see ops/splat.py SplatConfig; 0 = off).
    # Measured on a GT-pose/GT-depth 160-frame street map vs the exact
    # raycaster: AbsRel 0.2475 -> 0.0954 at IDENTICAL coverage (the raw
    # splat left 11.7% of pixels >1 m BEHIND the true surface —
    # scripts/probes/exp_splat_bleed.py).
    bleed_rel: float = 0.15
    bleed_abs: float = 0.5


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Fusion DB windows etc (reference: DenseSlam.h:429-435)."""
    fusion_db_capacity: int = 64      # fused keyframe DB (for de-fusion)
    # Store the DB as mm-uint16 depth + uint8 gray (the reference's own
    # int16-mm convention, DepthProvider.h:57-98). Fusion consumes the
    # dequantized values, so de-fusion replay stays exact; ~5x fewer DB
    # bytes rides every chunk-scan dispatch (per-dispatch overhead on the
    # tunneled runtime scales with argument bytes).
    fusion_db_quantized: bool = True
    keyframe_every: int = 1           # fuse every k-th keyframe (lowfreq_exp)
    # Spawn a new submap when the visible fraction of the active map drops
    # below this (reference F_originalBlocksThreshold, default -1 = disabled,
    # DenseSlam.h:502-507 / DenseSlam.cpp:554-565).
    new_submap_threshold: float = -1.0
    use_external_odometry: bool = True  # use frontend VO pose vs internal ICP
    bilateral_filter: bool = False
    # Sensor mode (reference: Input.h:30-35 MONOCULAR/STEREO/RGBD):
    # "stereo" — stereo VO + SGM depth; "rgbd" — caller supplies depth;
    # "mono" — monocular VO with ground-plane scale; fusion only happens
    # on frames where a depth image is supplied.
    sensor: str = "stereo"
    # Sharded-map allocation strategy (parallel/sharded_map.py):
    # "exchange" — each shard key-gens its own image-row slab, dedupes
    # locally, and routes keys to their owners with one small all_to_all
    # (divides the key-gen + dedupe-sort work that "replicated" repeats
    # on every shard — the weak-scaling residual found in round 3);
    # "replicated" — every shard computes the full frame's keys and keeps
    # its owned subset (zero communication).
    parallel_alloc: str = "exchange"
    # Renderer for previews / ICP model: "splat" (forward surface splat,
    # the TPU-native fast path) or "march" (bounded sphere tracing —
    # reference-exact but ~100x slower on this hardware).
    renderer: str = "splat"
    # Sub-voxel refinement steps after splat (ops/splat.py refine_depth):
    # each step is a sphere-tracing correction from trilinear TSDF samples
    # (~30 ms/step at KITTI res). 0 = raw splat estimate.
    splat_refine: int = 0
    # TSDF-consistency prune after refinement (refine_depth prune_sdf):
    # invalidate pixels whose refined point samples |tsdf| above this (or
    # unobserved space). The pull-push hole fill fabricates depth in
    # disocclusions; those fabrications are exactly the pixels that can't
    # be reconciled with the field — pruning turns multi-metre tail
    # errors into honest misses. 0 = keep everything.
    splat_prune_sdf: float = 0.0
    # Device-memory budget for the dense map across ALL submaps, in MB
    # (-1 = unbounded). When the summed HBM footprint (voxel pools +
    # fusion DBs, true array bytes) exceeds it, the oldest non-active
    # submaps are spilled to host DRAM — the ITMSwappingEngine::
    # SaveToGlobalMemory role (reference: DenseSlam.h:248-251); they are
    # restored on demand for online correction or composite rendering.
    map_memory_budget_mb: float = -1.0


@dataclasses.dataclass(frozen=True)
class SystemConfig:
    rig: StereoRig
    tsdf: TsdfConfig = TsdfConfig()
    frontend: FrontendConfig = FrontendConfig()
    stereo: StereoConfig = StereoConfig()
    backend: BackendConfig = BackendConfig()
    pipeline: PipelineConfig = PipelineConfig()
    splat: SplatParams = SplatParams()
    decay: VoxelDecayParams = VoxelDecayParams()
    slide_window: SlideWindowParams = SlideWindowParams()
    correction: OnlineCorrectionParams = OnlineCorrectionParams()
    postprocess: PostProcessParams = PostProcessParams()


def tiny_test_config(width: int = 80, height: int = 60,
                     baseline_m: float = 0.12,
                     **overrides) -> SystemConfig:
    """Small config for unit tests (CPU-runnable). fx scales with width so
    larger test images keep a realistic ~67 deg FOV and usable stereo
    geometry."""
    f = 0.75 * width
    intr = Intrinsics(fx=f, fy=f, cx=width / 2 - 0.5,
                      cy=height / 2 - 0.5, width=width, height=height)
    rig = StereoRig(intr=intr, baseline_m=baseline_m)
    tsdf = TsdfConfig(
        voxel_size_m=0.05,
        trunc_dist_m=0.2,
        table_slots=1 << 12,
        max_visible_blocks=1024,
        max_alloc_per_frame=1024,
        max_depth_m=10.0,
        raycast_steps=96,
    )
    cfg = SystemConfig(rig=rig, tsdf=tsdf)
    return dataclasses.replace(cfg, **overrides) if overrides else cfg
