"""Render configuration dataclasses.

Replaces the reference's Properties bags + GPMConfig::load option surface
(gvpm_struct.h:107-333) with typed dataclasses. All fields are static
Python values — changing one retriggers jit specialization, which is the
TPU analog of the reference's per-scene plugin instantiation.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class PathConfig:
    """Shared path-tracing options (MonteCarloIntegrator analog,
    integrator.h:444)."""
    max_depth: int = 12           # maximum path edges (reference maxDepth=12)
    rr_depth: int = 5             # start Russian roulette after this depth
    rr_clamp: float = 0.95
    null_bounces: int = 6         # extra iterations budget for null crossings


@dataclasses.dataclass(frozen=True)
class VolPathConfig(PathConfig):
    """Primal volumetric path tracer (reference: integrators/volpath)."""
    spp: int = 16
    nee: bool = True              # next-event estimation + MIS
    sampler: str = "independent"  # pixel sampler: independent | stratified
                                  # | ld | sobol | halton | hammersley
    rfilter: str = "box"          # reconstruction filter: box | tent |
                                  # gaussian | mitchell | catmullrom | lanczos


@dataclasses.dataclass(frozen=True)
class PhotonConfig(PathConfig):
    """Photon shooting + progressive estimation (GPMConfig analog)."""
    surface_photons: int = 65536      # photonCount per pass
    volume_photons: int = 65536       # volumePhotonCount per pass
    beams: int = 4096                 # number of stored light beams
    max_passes: int = 16
    alpha: float = 0.7                # radius reduction (gvpm.cpp:181)
    initial_scale: float = 1.0        # initialScale (surface radii)
    initial_scale_volume: float = 1.0 # initialScaleVolume
    rr_depth_photon: int = 10         # rrDepthPhoton ~ effectively off
    bounce_roughness: float = 0.05    # VertexClassifier threshold
    camera_sphere: float = 0.0        # photon skip radius near sensor
    grid_max_photons_per_cell: int = 32
    grid_hash_size: int = 1 << 18
    cam_rays_per_pixel: int = 1
    volume_samples: int = 2           # nbCameraSamples distance samples
    min_depth: int = 0
    max_cam_depth: int = 8            # camera path budget to 1st diffuse GP
    beam_tile: int = 256              # beam tile size for beam/plane scans
    beam_seg_tile: int = 32768        # camera segments per beam/plane
                                      # gather chunk: bounds live pair
                                      # planes to [seg_tile, beam_tile]
                                      # (BENCH_r03 OOM fix); 0 = unchunked
    vol_segments_per_pixel: int = 2   # compacted medium-segment budget
    gather_q_tile: int = 256          # queries per gather_dense chunk
                                      # (lax.map serializes chunks: big
                                      # tiles keep the TPU busy, small
                                      # ones bound CPU-host memory)
    bre_knn: int = 0                  # per-photon BRE radii from local
                                      # density, ~breInitSize kNN (bre.cpp:29)
                                      # 0 = single global radius
    gather_budget: int = 0            # candidate rows per query in the
                                      # prefix-compacted dense gather; 0 ->
                                      # 2*grid_max_photons_per_cell. Strided
                                      # subsample + T/B compensation on
                                      # overflow (hashgrid.gather_dense)
    grid_surface_rows: int = 0        # photon-map row cap for the surface
                                      # grid (0 = all S*P slots); sorting
                                      # puts invalid slots last, so the cap
                                      # only drops real photons when the
                                      # stored count exceeds it
    grid_volume_rows: int = 0         # same for the volume photon grid
    gather_driver: str = "cull"       # "cull": narrow-table ball cull +
                                      # K-compacted eval (the round-4
                                      # fast path, gather_window_culled);
                                      # "window": cell-run windowed dense
                                      # gather (ops/cellgrid.py, contiguous
                                      # full-row streaming);
                                      # "dense": legacy per-candidate row
                                      # gathers (ops/hashgrid.gather_dense)
    cull_k: int = 32                  # ball-hit candidate budget per query
                                      # for the cull driver (first-K with
                                      # cnt/K compensation on overflow;
                                      # size ~2-3x the expected kernel
                                      # occupancy)
    grid_dims: tuple = (64, 64, 64)   # static cell-grid dims for the
                                      # window driver (cell >= extent/dims)
    gather_window: int = 768          # rows streamed per tile run
    window_q_tile: int = 128          # queries per window tile (smaller
                                      # tiles -> tighter windows)
    pallas_q_tile: int = 96           # queries per fused-kernel tile
                                      # (driver="pallas"; [Qt, W] pair
                                      # planes live in VMEM — [128,256]
                                      # blew the 512^2 VMEM budget)
    pallas_window: int = 384          # rows per fused-kernel window DMA
                                      # (on-chip sweep r5: 96/384 beat
                                      # 64/256 and 64/512 on visits/s
                                      # with dropped/visits 1.65)
    beam_dispatch: str = "host"       # "host": beam/plane gathers run
                                      # one bounded device dispatch per
                                      # segment chunk (r5 fix for the
                                      # full-scale monolithic-dispatch
                                      # TPU faults); "fused": whole
                                      # sweep in one jit (lax.map)


@dataclasses.dataclass(frozen=True)
class GradientConfig(PhotonConfig):
    """Gradient-domain options (GPMConfig, gvpm_struct.h:181-333)."""
    recon_alpha: float = 0.2          # reconstructAlpha
    recon_l1: bool = True             # L1 vs L2 reconstruction
    recon_iters: int = 50             # CG iterations
    recon_irls_iters: int = 4         # IRLS outer iterations
    shift_null: bool = False          # nullShift MIS debug mode
    use_manifold: bool = True         # ME shift for delta parent chains
    max_manifold_iterations: int = 5
    me_pair_budget: int = 4096        # compacted (query,photon) ME pairs
                                      # per gather (overflow -> unilateral)
