"""Static render configuration.

The reference keeps this state spread across ``VolumeRaycaster.__init__``
(`/root/reference/differender/volume_raycaster.py:58-95`): resolutions, fov,
near/far, ``max_samples`` and hard-coded Blinn-Phong shading constants
(`:91-95`).  Here it is a single frozen (hashable) dataclass so it can be a
static argument under ``jax.jit``.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """All static knobs of the renderer.

    Attributes:
        volume_shape: Internal volume grid shape ``(X, Y, Z)``.  This is the
            *internal* axis order; the user-facing ``Raycaster`` accepts
            volumes in the reference's ``([BS,] 1, D, H, W)`` convention and
            converts (see `/root/reference/differender/volume_raycaster.py:551-571`).
        image_shape: Output image shape ``(H, W)``.
        tf_resolution: Number of texels of the 1D RGBA transfer function.
        sampling_rate: Default Nyquist multiplier for the differentiable path
            (reference default 1.0, `/root/reference/differender/volume_raycaster.py:479`).
        max_samples: Cap on differentiable march depth
            (`/root/reference/differender/volume_raycaster.py:267-269`).
        fov: Field of view in degrees.  NOTE the reference computes the near
            plane height as ``2*tan(fov)`` — *not* ``tan(fov/2)`` — so the
            effective vertical FOV is about twice the nominal value
            (`/root/reference/differender/volume_raycaster.py:146`).  We
            replicate that exactly.
        near/far: Near/far plane distances (far is unused by the math, kept
            for API parity).
        jitter: Default for jittering ray start positions.
        ambient/diffuse/specular/shininess: Blinn-Phong-style shading
            constants (`/root/reference/differender/volume_raycaster.py:91-94`).
        light_color: Headlight color (`:95`).
        ert_threshold: Early-ray-termination opacity threshold
            (`/root/reference/differender/volume_raycaster.py:267-268`).
        alpha_skip: Empty-space skip threshold of the non-differentiable path
            (`/root/reference/differender/volume_raycaster.py:334`).
        normal_delta: Central-difference step (in normalized [-1,1] coords)
            for gradient-based normals
            (`/root/reference/differender/volume_raycaster.py:193`).
        block_size: March steps per rematerialization block in the
            differentiable path (TPU memory/time tradeoff; the reference
            instead materializes a full ``(W, H, max_samples)`` render tape,
            `/root/reference/differender/volume_raycaster.py:82,102-103`).
        unroll: lax.scan unroll factor for the inner march loop.
    """

    volume_shape: Tuple[int, int, int]
    image_shape: Tuple[int, int]
    tf_resolution: int = 128
    sampling_rate: float = 1.0
    max_samples: int = 512
    fov: float = 30.0
    near: float = 0.1
    far: float = 100.0
    jitter: bool = True
    ambient: float = 0.4
    diffuse: float = 0.8
    specular: float = 0.3
    shininess: float = 32.0
    light_color: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    ert_threshold: float = 0.99
    alpha_skip: float = 1e-3
    normal_delta: float = 1e-3
    block_size: int = 32
    unroll: int = 1
    analytic_normals: bool = False   # fast mode: in-cell analytic gradient
                                     # (1 instead of 7 gathered cell rows per
                                     # sample; values exact, normals near-
                                     # identical — see
                                     # sampling.sample_with_gradient_analytic)
    cell_gather: bool = True         # march against the (X*Y*Z, 8) cell
                                     # table (one row gather per trilinear
                                     # sample; 8x volume memory) instead of
                                     # 8 scalar corner gathers — ~8-12x
                                     # faster on the per-index-cost TPU
                                     # gather (see sampling.cell_table)
    march_table: str = "auto"        # march volume operand:
                                     #   "flat"    — flat volume, 8 scalar
                                     #               gathers per sample
                                     #   "cell8"   — (X*Y*Z, 8) cell rows,
                                     #               1 (analytic) / 7
                                     #               (parity) per sample
                                     #   "super64" — (X*Y*Z, 64) 4x4x4
                                     #               neighborhood rows: the
                                     #               whole parity stencil =
                                     #               ONE gather; analytic
                                     #               groups supercell_group
                                     #               consecutive steps per
                                     #               gather.  64x memory.
                                     #   "super64s2" — stride-2 supercell
                                     #               rows (even bases): 8x
                                     #               less memory, whole
                                     #               parity stencil in one
                                     #               row; step groups under
                                     #               the tighter stride-2
                                     #               span bound (G=2 at
                                     #               512^3 / sr=1).
                                     #   "auto"    — super64 when the table
                                     #               fits super64_max_bytes
                                     #               (and semantics allow),
                                     #               else super64s2 for
                                     #               parity where IT fits,
                                     #               else cell8/flat per
                                     #               cell_gather.
    super64_max_bytes: int = 6 << 30
    march_vjp: str = "ad"            # volume-gradient path of the march:
                                     #   "ad"    — jax AD (scatter into the
                                     #             global table; exact, also
                                     #             gives look_from grads)
                                     #   "tiled" — hand-written VJP: per-
                                     #             image-tile scatter into a
                                     #             cache-resident box +
                                     #             dense fold (measured
                                     #             ~7-10 ns/row vs 60-190
                                     #             global).  Volume and TF
                                     #             grads exact; look_from
                                     #             grads are INCOMPLETE
                                     #             (sample-position terms
                                     #             dropped — the reference
                                     #             has no camera grads at
                                     #             all) — use "ad" if you
                                     #             differentiate the camera.
                                     #             Requires march_table
                                     #             super64 and image dims
                                     #             divisible by vjp_tile.
                                     #   "sorted" — hand-written VJP: sort
                                     #             each block's row
                                     #             cotangents by supercell
                                     #             base and scatter fixed
                                     #             windows into sub-64MB
                                     #             boxes folded straight to
                                     #             d_volume (measured 29.4
                                     #             vs 207.6 ns/row vs the AD
                                     #             big-table scatter —
                                     #             experiments/r4_scatter_
                                     #             results.jsonl).  EXACT
                                     #             for any base distribution
                                     #             (runtime sub-box passes,
                                     #             no clamping); volume/TF
                                     #             grads exact; look_from
                                     #             grads exact too when
                                     #             camera_grads=True (r5),
                                     #             zero otherwise.  Requires
                                     #             march_table super64 or
                                     #             super64s2.  KNOWN LIMIT:
                                     #             at 512^3-class volumes
                                     #             the placement graph
                                     #             crashes the remote TPU
                                     #             compile helper (HTTP
                                     #             500; blocks 32/64, boxes
                                     #             up to 2^20 rows tried) —
                                     #             use "ad" there
                                     #             (BASELINE.md).
    vjp_tile: int = 16               # image tile edge (pixels) of the tiled
                                     # VJP's scatter locality
    vjp_box: int = 32                # voxel box edge of the tiled VJP's
                                     # local accumulation (box^3 * 256 B
                                     # must stay cache-resident: 32 -> 8 MB)
    vjp_box_rows: int = 1 << 18      # sorted-VJP box extent in supercell-
                                     # table rows; 2^18 * 256 B = 64 MB —
                                     # the measured allocation-size cliff
                                     # below which TPU scatter runs ~14x
                                     # cheaper (r4_scatter_results.jsonl)
    vjp_window_rows: int = 1 << 16   # sorted-VJP rows per sorted window
                                     # (one small-box scatter per window in
                                     # the typical spatially-local case).
                                     # Swept at the headline config: 64k
                                     # 1.52 s fwd+bwd vs 128k 1.67 / 256k
                                     # 2.23 / 32k 2.02 / 16k 1.90
                                     # (r4_session2_results.jsonl)
    vjp_check: bool = False          # tiled-VJP runtime containment check:
                                     # a tile whose sample footprint exceeds
                                     # vjp_box poisons its gradient with NaN
                                     # (loud) instead of silently clamping
                                     # to wrong voxels.  Enable when
                                     # validating a new tile/box/fov combo.
    camera_grads: bool = False       # declare intent to jax.grad w.r.t.
                                     # look_from (beyond the reference,
                                     # which never differentiates the
                                     # camera).  Camera grads flow on
                                     # march_vjp='ad' AND (round 5)
                                     # 'sorted' — the sorted VJPs emit
                                     # exact sample-position cotangents
                                     # when this flag is set, at the cost
                                     # of one extra row gather per block
                                     # backward.  MEASURED SCALE LIMIT
                                     # (r27 rows): sorted+camera compiles
                                     # and runs at 128^3/256^2 (0.47 s vs
                                     # 0.21 s without camera terms); at
                                     # 256^3-class the position-VJP graph
                                     # exceeds the remote compile budget
                                     # (deterministic helper crash, with
                                     # or without compaction) — use
                                     # march_vjp='ad' there.  'tiled'
                                     # still drops the position terms, so
                                     # render() REFUSES tiled+camera_grads
                                     # instead of returning silently-wrong
                                     # grads; the blockwise 512^3 backward
                                     # likewise refuses (host-built rays).
    occupancy_skip: bool = True      # nondiff path: macrocell distance-
                                     # field empty-space jumps (semantics-
                                     # exact — skipped samples provably sit
                                     # below alpha_skip; see
                                     # differender_tpu.occupancy)
    occupancy_cell: int = 0          # macrocell edge in voxels; 0 = auto:
                                     # the smallest edge in {2,4,8,16,32}
                                     # whose grid stays <= 2^21 cells (the
                                     # cheap small-table gather zone).
                                     # Finer cells resolve thinner empty
                                     # gaps: at 256^3/sr=16 cell 2 rendered
                                     # in 2.06 s vs 5.33 s at cell 8, and
                                     # is cost-neutral at sr=1
                                     # (r4_session2_results.jsonl)
    occupancy_max_dist: int = 0      # distance-field saturation (macrocells;
                                     # the max empty-space jump is
                                     # (max_dist-1) cells).  0 = auto:
                                     # ~96 voxels of reach (96 // cell) —
                                     # finer cells need a higher cap to
                                     # cross the same world distance
    nondiff_compaction: bool = True  # nondiff path: wavefront compaction —
                                     # march a compacted alive-ray prefix
                                     # through a static N -> N/4 -> ...
                                     # phase ladder (same per-ray sample
                                     # sequence, images equal to ~1 ulp;
                                     # per-iteration cost tracks the alive
                                     # count instead of the full image)
    compaction_min: int = 4096       # smallest compaction phase size (the
                                     # ladder divides by 4 until here; 4096
                                     # measured >= 16384 at every sweep
                                     # point, r4_session2_results.jsonl)
    occupancy_jump_every: int = 1    # evaluate the distance-field jump
                                     # every Nth march iteration (each jump
                                     # costs one extra gather op per
                                     # iteration; >1 trades skip
                                     # granularity for op count)
    ert_block_skip: bool = True      # runtime-skip fully-terminated march
                                     # blocks in the DIFF path (exact; 2.07x
                                     # fwd / 1.83x fwd+bwd measured).  Off:
                                     # plain scan — needed where the cond's
                                     # extra backward memory does not fit
                                     # (parity mode at 256^3/512^2).
    compact_after: int = 0           # DIFF-path alive-ray compaction: after
                                     # this many march blocks, permute rays
                                     # alive-first and march the remaining
                                     # blocks as a scan over compact_prefix-
                                     # sized ray tiles with a per-tile skip
                                     # (sorted => alive rays fill a prefix;
                                     # only ceil(alive/P) tiles march).
                                     # 0 = off.  Exact per ray: the
                                     # alive predicate is the march's own
                                     # prefix-closed gate ((acc_a < ert) &
                                     # (n_samples > s0)), so skipped rays'
                                     # remaining blocks are no-ops; lane
                                     # order never enters the per-ray math.
                                     # Motivation: ERT-effective samples
                                     # are 16% of nominal at the headline
                                     # noise scene while the global block
                                     # skip marches (and the sorted VJP
                                     # sorts+takes) every lane — the
                                     # (M, 64) cotangent take at 17.6
                                     # ns/row is the single largest
                                     # backward cost (r14/r15 rows,
                                     # experiments/r8_headline_results
                                     # .jsonl).  Requires ert and a
                                     # non-'tiled' march_vjp.
    compact_prefix: float = 0.25     # static alive-prefix fraction of H*W
                                     # marched after compaction (rounded up
                                     # to a multiple of 512)

    # ------------------------------------------------------------------
    # Derived static quantities
    # ------------------------------------------------------------------
    @property
    def height(self) -> int:
        return self.image_shape[0]

    @property
    def width(self) -> int:
        return self.image_shape[1]

    @property
    def aspect(self) -> float:
        """W/H, matching ``render_resolution[0]/render_resolution[1]``
        (`/root/reference/differender/volume_raycaster.py:75`)."""
        return self.width / self.height

    @property
    def fov_rad(self) -> float:
        return math.radians(self.fov)

    @property
    def vol_diag(self) -> float:
        """``‖volume_shape − 1‖₂`` — the Nyquist sample-count scale
        (`/root/reference/differender/volume_raycaster.py:248-249`)."""
        x, y, z = self.volume_shape
        return math.sqrt((x - 1.0) ** 2 + (y - 1.0) ** 2 + (z - 1.0) ** 2)

    def max_steps_for(self, sampling_rate: float) -> int:
        """Static upper bound on per-ray sample counts for a sampling rate.

        The longest chord through the [-1,1]^3 box is its diagonal 2*sqrt(3),
        so ``n_samples = floor(sr * ray_len * vol_diag) + 1`` is bounded by
        this value (`/root/reference/differender/volume_raycaster.py:251-253`).
        """
        return int(math.floor(sampling_rate * 2.0 * math.sqrt(3.0) * self.vol_diag)) + 1

    def diff_march_steps(self, sampling_rate: float) -> int:
        """Static trip count of the differentiable march.

        The reference's differentiable kernel never composites past
        ``max_samples`` (`/root/reference/differender/volume_raycaster.py:267-269`),
        so the scan bound is ``min(max_samples, geometric upper bound)``.
        """
        return min(self.max_samples, self.max_steps_for(sampling_rate))

    def use_blockwise_grad(self) -> bool:
        """True when the monolithic sorted backward is known to exceed the
        remote TPU compile budget and the host-level blockwise split
        backward (:func:`differender_tpu.render.value_and_grad_blockwise`)
        should be used instead.

        Measured boundary (experiments/r5_sorted512_results.jsonl): the
        256^3 headline sorted config compiles monolithically; 512^3
        stride-2 sorted crashes the compile helper at every strip/box/
        window/block knob, while every program of the split backward
        compiles.  The predicate keys on the stride-2 table (the
        auto-resolution already picks it exactly for 512^3-class parity
        volumes) plus a >= 2^26-voxel floor so small stride-2 test
        configs keep the cheaper monolithic path.

        ``camera_grads`` opts OUT: the blockwise backward builds rays
        eagerly on the host and cannot return a look_from gradient, so
        such configs keep the monolithic path (which may hit the compile
        limit at 512^3 — camera grads at that scale are an open corner).
        """
        import numpy as _np
        return (self.march_vjp == "sorted"
                and not self.camera_grads
                and self.resolved_march_table() == "super64s2"
                and int(_np.prod(self.volume_shape)) >= (1 << 26))

    def resolved_march_table(self) -> str:
        """Resolve the ``march_table`` knob (see its docstring).

        ``super64`` requires the parity stencil to fit one 4x4x4 row:
        ``2 * normal_delta * (size-1) < 1`` voxel, i.e. size <= 500 at the
        reference delta 1e-3 — always true at practical resolutions.
        """
        if self.march_table != "auto":
            return self.march_table
        x, y, z = self.volume_shape
        bytes64 = x * y * z * 64 * 4
        # The stencil-fit condition only constrains PARITY sampling (the
        # 7-point central-difference stencil must fit one 4x4x4 row);
        # analytic normals never touch the stencil.
        stencil_ok = (self.analytic_normals
                      or 2.0 * self.normal_delta
                      * (max(self.volume_shape) - 1.0) < 1.0)
        if bytes64 <= self.super64_max_bytes and stencil_ok:
            return "super64"
        # Stride-2 supercell fallback for PARITY at scales where the full
        # table exceeds the gate (512^3: 4.3 GB vs 34 GB): one 64-wide row
        # still covers the whole stencil despite the <=2-voxel even-base
        # slack whenever span = delta*(size-1) < 1 (u < 2 + span < 3).
        # Analytic mode sticks with cell8 (one narrow row per sample plus
        # step grouping beats an ungroupable stride-2 row there).
        if (not self.analytic_normals
                and bytes64 // 8 <= self.super64_max_bytes
                and self.normal_delta * (max(self.volume_shape) - 1.0) < 1.0
                and all(s % 2 == 0 for s in self.volume_shape)):
            return "super64s2"
        return "cell8" if self.cell_gather else "flat"

    def supercell_group(self, sampling_rate: float) -> int:
        """How many consecutive march steps may share one supercell row.

        ``sampling_rate`` must be a guaranteed LOWER bound of the rate the
        march actually steps at (the traced rate) — a larger value
        under-estimates the step span and the group would read outside the
        gathered 4x4x4 row.  Callers with a traced rate and no bound must
        use group 1 (see ``render._safe_supercell_group``).

        A group of G steps along a ray spans at most
        ``(G-1) * 1.5 * (s_max - 1) / (2 * sr * vol_diag)`` voxels per axis
        (the 1.5 covers the short-ray n=2 worst case of the reference's
        ``mix(entry + 0.5 len/n, exit, s/(n-1))`` step); in parity mode the
        central-difference stencil widens the span by its diameter
        ``delta * (s_max - 1)`` voxels.  The 4x4x4 row covers a 3-cell
        span, so the group is valid when the total span < 2 (cells within
        [base, base+2] with floors' +-1 slack).  Groups also must divide
        the march block size.
        """
        s_max = max(self.volume_shape) - 1.0
        step_vox = 1.5 * s_max / (2.0 * sampling_rate * self.vol_diag)
        stencil_vox = (0.0 if self.analytic_normals
                       else self.normal_delta * s_max)
        # Stride-2 tables quantize the base to even coordinates, which
        # costs ONE extra voxel of slack vs the stride-1 floor bound:
        # total span + 2 must stay < 3, i.e. span < 1 (at 512^3 / sr=1
        # that admits G=2 — half the round-3 per-sample gather count).
        span_max = (1.0 if self.resolved_march_table() == "super64s2"
                    else 2.0)
        # High sampling rates step a small fraction of a voxel, so MANY
        # consecutive samples share one row — at the reference's
        # sampling_rate=16 inference workload a single 64-wide gather
        # serves 32+ samples (the round-3 lever for high-rate marches).
        for g in (64, 32, 16, 8, 4, 2):
            if ((g - 1) * step_vox + stencil_vox < span_max
                    and self.block_size % g == 0):
                return g
        return 1

    def resolved_occupancy(self) -> Tuple[int, int]:
        """(cell, max_dist) with the auto (0) defaults resolved.

        Cell: the smallest edge in {2, 4, 8, 16, 32} whose macrocell grid
        has <= 2^21 cells — the distance field stays <= 8 MB, inside this
        stack's measured cheap small-table gather zone (CLAUDE.md rule 5 /
        r4_scatter pricing), while resolving the thinnest empty gaps the
        budget allows.  Max_dist: ~96 voxels of jump reach regardless of
        cell size.
        """
        cell = self.occupancy_cell
        if cell == 0:
            for cell in (2, 4, 8, 16, 32):
                n_cells = 1
                for s in self.volume_shape:
                    n_cells *= -(-s // cell)
                if n_cells <= 1 << 21:
                    break
        md = self.occupancy_max_dist
        if md == 0:
            md = max(2, 96 // cell)
        return cell, md

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)
