"""High-level solver API: pick the best layout for the graph at hand.

`AnnulusSolver` packs the graph once (circulant layout when the mesh's
rotational symmetry verifies, padded ELL otherwise) and then serves
repeated solves - the pattern the reference encourages with its
(init_annulus once, bfm per source) split, but with the packing cost made
explicit and amortised.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import scipy.sparse as sp

from ..config import DEFAULT_SOLVER_CONFIG, SolverConfig
from ..ops.circulant import (
    CirculantError,
    CirculantGraph,
    build_circulant,
    solve_circulant,
)

from . import bfm as _bfm
from .types import BellmanFordMoore


class AnnulusSolver:
    """One-time graph packing + repeated SSSP solves.

    method:
      'auto'      -> 'sweep' on TPU (fastest at every measured size, see
                     benchmarks/chip_campaign_r03.log: 32 vs 38 ms at
                     150k nodes, 87 vs 511 ms at 3.25M, 190 vs 1465 ms
                     at 6.85M device-resident; falls back to the Jacobi
                     kernels 'twrapped'/'stream' when the circulant
                     layout lacks sweep support); 'circulant' elsewhere
                     (the Pallas kernels' interpret mode is for tests
                     only)
      'twrapped'  -> theta-major full-iteration Pallas kernel
                     (ops/wrapped_t.py): moving-frame band sweep with
                     min-plus band closure, scans + fan in-kernel
      'sweep'     -> directional-sweep solver (ops/sweep_theta.py):
                     Gauss-Seidel radial Pallas sweeps + hierarchical
                     horizontal closure; converges in ~3-4 ROUNDS at any
                     grid size (vs O(ntheta) Jacobi iterations) - the
                     large-grid fast path
      'stream'    -> streamed theta-major path (ops/stream_t.py): scans
                     at XLA level, band sweep as a theta-blocked Pallas
                     kernel with HBM-streamed pages - no VMEM ceiling;
                     Jacobi iteration structure
      'wrapped'   -> slot-major full-iteration wrapped-lane Pallas kernel
                     (ops/diag_wrapped.py): scans + band sweep + fan all
                     in-kernel, multiple iterations per dispatch
      'diag'      -> diagonal-band Pallas kernel (ops/diag_circulant.py):
                     no gathers, sublane-shifted add+min per diagonal
      'pallas'    -> Pallas lane-gather kernel, per-sweep grid launch
                     (near-free source batching along kernel rows)
      'fused'     -> whole-solve-in-one-Pallas-kernel (VMEM-resident
                     distance field; minutes-long first compile - use the
                     persistent compilation cache)
      'circulant' -> jnp circulant solver (row gathers; reliable compile)
      'banded'    -> RCM-banded diagonal sweep (ops/banded.py): ANY
                     graph, no gathers - the unstructured-mesh fast
                     path (~60x the ELL path on TPU)
      'ell'       -> general padded-ELL solver (any graph, incl. 3-D)
    Non-circulant meshes fall back to 'banded' under auto on TPU,
    'ell' elsewhere.
    """

    def __init__(
        self,
        gr,
        A: Optional[sp.csr_matrix],
        halo: Optional[np.ndarray],
        U: np.ndarray,
        config: SolverConfig = DEFAULT_SOLVER_CONFIG,
        method: str = "auto",
        cache_dir: Optional[str] = None,
        circulant: Optional[CirculantGraph] = None,
    ):
        """Pass `circulant=` a prebuilt CirculantGraph (e.g. from the O(M)
        fast builder, models/fast_annulus.py::init_annulus_circulant) to
        skip the extraction; A and halo may then be None (the stencil
        already encodes the graph; host-side PrevRecovery is unavailable,
        the device recovery is used instead)."""
        self.gr = gr
        self.A = A
        self.halo = (np.asarray(halo) if halo is not None
                     else np.empty((0, 2), np.int64))
        self.U = np.asarray(U)
        self.config = config
        self.circulant: Optional[CirculantGraph] = circulant
        self.ell = None
        self.last_iterations: Optional[int] = None

        fallback = "ell"
        was_auto = method == "auto"
        if method == "auto":
            import jax

            if jax.devices()[0].platform == "tpu":
                # the directional-sweep engine wins at every measured
                # size (chip campaign r03, device-resident: 32 vs 38 ms
                # at 150k nodes, 52 vs 100 ms at 828k, 87 vs 511 ms at
                # 3.25M, 190 vs 1465 ms at 6.85M) because its round
                # count is constant (~2-4) where the Jacobi kernels pay
                # O(span) iterations; Jacobi routing kept as the
                # fallback for circulants without sweep support
                method = "sweep"
                # non-circulant meshes: the gather-free banded sweep
                # beats the ELL gather path by ~2 orders of magnitude on
                # TPU (ops/banded.py)
                fallback = "banded"
            else:
                method = "circulant"
        self._requested = method
        self._diag_stencil = None
        self._wrapped_stencil = None
        self._twrapped_stencil = None
        self._sweep_stencil = None
        self._device_cache: dict = {}
        self._interpret_cached = None

        dtype = np.dtype(config.dtype)
        if circulant is not None and method in ("ell", "banded"):
            raise ValueError(
                f"method={method!r} needs the materialised graph; a prebuilt "
                "circulant stencil only serves the circulant-family methods")
        if method in ("twrapped", "sweep", "stream", "wrapped", "diag",
                      "pallas", "circulant", "fused"):
            try:
                if self.circulant is not None:
                    pass  # prebuilt (fast builder) - skip extraction
                elif cache_dir is not None:
                    from ..utils.cache import build_circulant_cached

                    self.circulant = build_circulant_cached(gr, A, halo, U, dtype, cache_dir)
                else:
                    self.circulant = build_circulant(gr, A, halo, U, dtype=dtype)
                if method == "sweep" and was_auto:
                    from ..ops.wrapped_t import supports_twrapped

                    # auto only: unsupported wrap structure re-routes to
                    # the Jacobi chain (twrapped/stream by size)
                    if not supports_twrapped(self.circulant):
                        method = ("twrapped" if gr.nnods <= 350_000
                                  else "stream")
                if method == "twrapped":
                    from ..ops.wrapped_t import supports_twrapped

                    if not supports_twrapped(self.circulant):
                        method = "wrapped"
                if method == "wrapped":
                    from ..ops.diag_wrapped import supports_wrapped

                    if not supports_wrapped(self.circulant):
                        method = "diag"
                self._method = method
            except CirculantError as e:
                import warnings

                warnings.warn(f"circulant layout unavailable ({e}); "
                              f"falling back to {fallback}")
                self._method = fallback
        elif method == "banded":
            self._method = "banded"
        else:
            self._method = "ell"
        self.banded = None
        self._prev_rec = None
        if self.circulant is None:
            if self._method == "banded":
                from ..ops.banded import prepare_banded

                self.banded = prepare_banded(A, halo, gr, U, config)
            else:
                self.ell = _bfm.prepare(A, halo, gr, U, config)

    @property
    def method(self) -> str:
        return self._method

    @property
    def _interpret(self) -> bool:
        """Mosaic kernels only compile on TPU; off-TPU an explicitly
        requested kernel method runs in Pallas interpret mode (the
        testing mode every kernel is equality-tested under) instead of
        crashing in the backend lowering."""
        if self._interpret_cached is None:
            import jax

            self._interpret_cached = jax.devices()[0].platform != "tpu"
        return self._interpret_cached

    def _dist_batch(self, sources: Sequence[int],
                    receivers=None, batch: int = 8,
                    device_out: bool = False) -> np.ndarray:
        """(S, n) distance fields for a batch of sources; with `receivers`,
        (S, n_receivers) — extracted on device where the method supports it
        (the full-field device->host pull dominates table workloads).
        `batch` bounds the per-dispatch source block of the batched
        kernels (VMEM scales with it).  device_out=True keeps the rows
        device-resident on the kernel paths (ignored by fallbacks)."""
        if self._method == "twrapped":
            from ..ops.wrapped_t import (
                max_twrapped_batch,
                pack_twrapped_stencil,
                solve_circulant_twrapped,
            )

            if self._twrapped_stencil is None:
                self._twrapped_stencil = pack_twrapped_stencil(
                    self.circulant, dtype=np.dtype(self.config.dtype),
                    band_closure=self.config.band_closure,
                )
            # clamp the source block to what the monolithic kernel's VMEM
            # holds; a grid too large even at S=1 self-routes to the
            # streamed path (no ceiling)
            smax = max_twrapped_batch(self._twrapped_stencil)
            if smax < 1:
                self._method = "stream"
            else:
                dist, iters = solve_circulant_twrapped(
                    self.circulant, sources, self.config,
                    batch=min(batch, smax, len(sources)),
                    receivers=receivers, device_out=device_out,
                    interpret=self._interpret,
                    _packed=self._twrapped_stencil
                )
                self.last_iterations = iters
                return dist
        if self._method == "sweep":
            from ..ops.sweep_theta import solve_circulant_sweep
            from ..ops.wrapped_t import pack_twrapped_stencil

            # the sweep tables are rebuilt from the RAW decomposition:
            # the shared stencil must be packed closure-free
            if self._sweep_stencil is None:
                self._sweep_stencil = pack_twrapped_stencil(
                    self.circulant, dtype=np.dtype(self.config.dtype),
                    band_closure=0,
                )
            import jax

            on_tpu = jax.devices()[0].platform == "tpu"
            dist, iters = solve_circulant_sweep(
                self.circulant, sources, self.config,
                batch=min(batch, len(sources)), receivers=receivers,
                device_out=device_out,
                engine="pallas" if on_tpu else "xla",
                interpret=False, _packed=self._sweep_stencil,
            )
            self.last_iterations = iters
            return dist
        if self._method == "stream":
            from ..ops.stream_t import solve_circulant_stream
            from ..ops.wrapped_t import pack_twrapped_stencil

            if self._twrapped_stencil is None:
                self._twrapped_stencil = pack_twrapped_stencil(
                    self.circulant, dtype=np.dtype(self.config.dtype),
                    band_closure=self.config.band_closure,
                )
            dist, iters = solve_circulant_stream(
                self.circulant, sources, self.config,
                band_closure=self.config.band_closure,
                batch=min(batch, len(sources)), receivers=receivers,
                device_out=device_out, interpret=self._interpret,
                _packed=self._twrapped_stencil
            )
            self.last_iterations = iters
            return dist
        if self._method == "wrapped":
            from ..ops.diag_wrapped import pack_wrapped_stencil, solve_circulant_wrapped

            if self._wrapped_stencil is None:
                self._wrapped_stencil = pack_wrapped_stencil(
                    self.circulant, dtype=np.dtype(self.config.dtype)
                )
            dist, iters = solve_circulant_wrapped(
                self.circulant, sources, self.config,
                batch=min(batch, len(sources)), receivers=receivers,
                device_out=device_out, interpret=self._interpret,
                _packed=self._wrapped_stencil
            )
            self.last_iterations = iters
            return dist
        dist = self._dist_batch_full(sources)
        return dist if receivers is None else dist[:, receivers]

    def _dist_batch_full(self, sources: Sequence[int]) -> np.ndarray:
        if self._method == "fused":
            from ..contrib.fused_circulant import solve_circulant_fused

            dist, iters = solve_circulant_fused(self.circulant, sources, self.config)
            self.last_iterations = iters
            return dist
        if self._method == "diag":
            from ..ops.diag_circulant import pack_diag_stencil, solve_circulant_diag

            if self._diag_stencil is None:
                self._diag_stencil = pack_diag_stencil(
                    self.circulant, dtype=np.dtype(self.config.dtype)
                )
            dist, iters = solve_circulant_diag(
                self.circulant, sources, self.config,
                interpret=self._interpret, _packed=self._diag_stencil
            )
            self.last_iterations = iters
            return dist
        if self._method == "pallas":
            from ..contrib.pallas_circulant import solve_circulant_pallas

            dist, iters = solve_circulant_pallas(self.circulant, sources,
                                                 self.config,
                                                 interpret=self._interpret)
            self.last_iterations = iters
            return dist
        if self._method == "circulant":
            rows = []
            for s in sources:
                d, iters = solve_circulant(self.circulant, int(s), self.config)
                self.last_iterations = iters
                rows.append(d)
            return np.stack(rows)
        if self._method == "banded":
            from ..ops.banded import solve_banded

            dist, iters = solve_banded(self.banded, list(sources), self.config)
            self.last_iterations = iters
            return dist
        return np.stack([_bfm.solve(self.ell, int(s), self.config).dist for s in sources])

    def recover_prev(self, dist) -> np.ndarray:
        """Predecessor tree from a converged distance field: the device
        argmin sweep on circulant meshes, the host PrevRecovery
        elsewhere (the same machinery `solve(want_prev=True)` uses —
        callers with external fields, e.g. the locator's reciprocity
        station fields, share it here)."""
        if self.circulant is not None:
            from ..ops.circulant import recover_prev_device

            return recover_prev_device(self.circulant, dist,
                                       _dcache=self._device_cache)
        if self._prev_rec is None:
            from ..ops.circulant import PrevRecovery

            self._prev_rec = PrevRecovery(self.gr, self.A, self.halo,
                                          self.U)
        return self._prev_rec(np.asarray(dist, dtype=np.float64))

    def solve(self, source: int, want_prev: bool = True,
              device_dist: bool = False) -> BellmanFordMoore:
        """Single-source solve.  device_dist=True (kernel paths only)
        returns `dist` as a device-resident jax array after the solve has
        fully converged (the iteration count is pulled, which syncs the
        whole while_loop) — the same contract as the reference GPU
        solver, whose bfm_gpu returns CuArrays without a device->host
        copy (src/SSSP/bfm_gpu.jl:207-247).  `np.asarray(D.dist)`
        materialises on demand."""
        if self.circulant is None:
            if self._method == "banded":
                from ..ops.banded import solve_banded

                dist, iters = solve_banded(self.banded, [source], self.config)
                self.last_iterations = iters
                dist = dist[0]
                if want_prev:
                    prev = self.recover_prev(dist)
                    prev[source] = source
                else:
                    prev = np.arange(len(dist))
                return BellmanFordMoore(prev=prev, dist=dist)
            return _bfm.solve(self.ell, source, self.config)
        dist = self._dist_batch([source], device_out=device_dist)[0]
        if want_prev:
            prev = self.recover_prev(dist)
            prev[source] = source
        else:
            prev = np.arange(len(dist))
        return BellmanFordMoore(prev=prev, dist=dist)

    def sensitivity_matrix(self, D: BellmanFordMoore, source: int,
                           receivers: Sequence[int], max_len: int = 0):
        """(n_rec, n) tomography kernels dt/dU for this solver's grid,
        velocity and halo (solvers/sensitivity.py), from a
        `solve(source)` result that carries prev.  max_len bounds the
        device backtrace depth (0 = a safe grid-derived default)."""
        from .sensitivity import sensitivity_matrix

        if max_len <= 0:
            nt = int(getattr(self.gr, "ntheta", 0) or 0)
            nr = int(getattr(self.gr, "nr", 0) or 0)
            max_len = 4 * (nt + nr) if (nt and nr) else 2048
        return sensitivity_matrix(self.gr, self.U, D.prev, source,
                                  receivers, max_len, self.halo)

    def refined_travel_times(self, source: int,
                             receivers: Sequence[int],
                             D: BellmanFordMoore = None,
                             profile=None,
                             m: int = 128, iters: int = 800,
                             lr: float = 3.0, quad: int = 8,
                             multistart: bool = True) -> np.ndarray:
        """(n_rec,) bending-refined first arrivals (solvers/refine.py):
        solve (or reuse D with prev), backtrace each receiver, bend the
        fan in batched chunked dispatches; `multistart` additionally
        bends refraction-branch candidates for close receivers and
        keeps the minimum (cures branch trapping - ACCURACY.md 2e).

        profile: (radii, velocities) radial table for the continuous
        functional - pass the source model (e.g. the AK135 1-km table)
        for the full accuracy of ACCURACY.md 2e.  Default None uses the
        solver's own sampled (r, U): on coarse grids that is a visibly
        coarser velocity model, and the refined time is the Fermat
        limit of THAT model (still strictly below the SPM time)."""
        from .locate import _radial_profile
        from .path import recontruct_path
        from .refine import refine_fan

        if D is None:
            D = self.solve(source, want_prev=True)
        rs, vs = _radial_profile(profile, self.gr.r, self.U)
        paths = [recontruct_path(D.prev, source, r) for r in receivers]
        pts = [np.stack([self.gr.x[p], self.gr.z[p]], axis=1)
               for p in paths]
        return refine_fan(pts, rs, vs, m=m, iters=iters, lr=lr,
                          quad=quad, multistart=multistart)

    def refined_travel_time_table(self, sources: Sequence[int],
                                  receivers: Sequence[int],
                                  profile=None, m: int = 384,
                                  iters: int = 1600, lr: float = 3.0,
                                  quad: int = 16,
                                  multistart: bool = True,
                                  multistart_max_deg: float = 32.0
                                  ) -> np.ndarray:
        """(n_sources, n_receivers) bias-free first-arrival table: solve
        + prev + backtrace per source, then bend the WHOLE table's path
        fan (n_sources*n_receivers polylines) in one batched chunked
        dispatch series (solvers/refine.py).  Per-source bending would
        pay the full optimisation wall-clock n_sources times; batching
        it amortises the device dispatches across the table, the same
        shape the raw `travel_time_table` exploits.  Defaults are the
        accuracy-grade bending config (m=384, quad=16: functional
        quadrature error < 0.25 s, ACCURACY.md 2e).

        multistart: bending is local - near branch crossovers (the Pn/Pg
        crossover under ~10 deg, the 410/660 triplications at 14-28 deg)
        the SPM first-arrival polyline can trap the optimiser on a
        branch up to ~3 s slow.  For pairs closer than
        `multistart_max_deg` this also bends critical-angle refraction
        geometries per candidate interface (refine.refraction_inits)
        at lr=1.0 and keeps the per-pair minimum - every candidate is an
        upper bound on the true Fermat minimum, so min() only tightens."""
        from .locate import _radial_profile
        from .path import recontruct_path
        from .refine import refine_fan

        rs, vs = _radial_profile(profile, self.gr.r, self.U)
        pts = []
        for s in sources:
            D = self.solve(int(s), want_prev=True)
            for r in receivers:
                p = recontruct_path(D.prev, int(s), int(r))
                pts.append(np.stack([self.gr.x[p], self.gr.z[p]], axis=1))
        t = refine_fan(pts, rs, vs, m=m, iters=iters, lr=lr, quad=quad,
                       multistart=multistart,
                       multistart_max_deg=multistart_max_deg)
        return t.reshape(len(sources), len(receivers))

    def travel_time_table(self, sources: Sequence[int], receivers: Sequence[int],
                          batch: int = 8) -> np.ndarray:
        """(n_sources, n_receivers) first-arrival table (no predecessors).

        Sources run in batches (batched along the Pallas kernel's row axis,
        which amortises its flat per-gather cost nearly perfectly); only
        the receiver columns cross the device->host boundary.  The
        twrapped path is handed the WHOLE source list at once - it
        chunk-splits internally, dispatches every chunk asynchronously
        and syncs a single time (one ~28 ms tunnel round trip per table,
        not per chunk).
        """
        receivers = np.asarray(receivers)
        if self._method in ("twrapped", "sweep", "stream", "wrapped"):
            return self._dist_batch([int(s) for s in sources],
                                    receivers=receivers, batch=batch)
        out = np.empty((len(sources), len(receivers)),
                       dtype=np.dtype(self.config.dtype))
        for i in range(0, len(sources), batch):
            chunk = [int(s) for s in sources[i:i + batch]]
            out[i:i + len(chunk)] = self._dist_batch(chunk, receivers=receivers)
        return out
