"""Lagrangian drifters — virtual buoy trajectories.

Equivalent of the reference's Drifters class (reference: model/drifters.cpp:
33-976, drifters.hpp:33-324): particles advected with the ice velocity,
initialised from a regular spacing (equally-spaced), from a text file (IABP,
SIDFEx), or from the OSISAF grid; masked below a concentration threshold;
output as text or NetCDF; participating in restart.

In the reference, buoys move with the accumulated total displacement M_UT
between drifter outputs interpolated from mesh nodes (drifters.cpp move()).
Here positions integrate the node velocity field each model step (explicit
Euler with per-step bilinear sampling — equivalent to the reference's
piecewise-linear-in-time motion at the model-step resolution).

Positions live on the host as numpy arrays (particle counts are tiny
relative to the grid); the velocity sampling happens on already-fetched
host copies of vt so no extra device syncs occur.
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

from nextsim_tpu.utils import dates


class DrifterSet:
    def __init__(
        self,
        tag: str,
        x: np.ndarray,
        y: np.ndarray,
        ids: np.ndarray,
        grid,
        conc_limit: float = 0.15,
        output_dt_days: float = 0.5,
        time_init: float = 0.0,
    ):
        self.tag = tag
        self.x = np.asarray(x, np.float64)
        self.y = np.asarray(y, np.float64)
        self.ids = np.asarray(ids, np.int64)
        self.alive = np.ones_like(self.x, dtype=bool)
        self.grid = grid
        self.conc_limit = conc_limit
        self.output_dt_days = output_dt_days
        self._last_output = time_init
        self.records: List[Dict] = []
        #: fixed init time (RGPS/SIDFEx, reference TimingInfo fixed init,
        #: drifters.cpp) — the buoys neither move nor output before this
        self.active_from = time_init
        #: flavour does not restore from restart files when set
        #: (drifters.<tag>_ignore_restart)
        self.ignore_restart = False
        #: finite lifetime [days] (OSISAF: 2.0); 0 = infinite. On expiry the
        #: set re-seeds via `reseed_fn(conc)` and starts a fresh window
        #: (reference TimingInfo lifetime, fe.cpp:13598-13604)
        self.lifetime_days = 0.0
        self.reseed_fn = None

    def maybe_reseed(self, t: float, conc: np.ndarray) -> bool:
        """Finite-lifetime sets: at active_from + lifetime, re-initialise
        positions from the seed grid and open the next window. Sets whose
        activation lies in the future seed at activation (the reference
        initialises each OSISAF window from the conc of its start time)."""
        if not self.lifetime_days or self.reseed_fn is None:
            return False
        if getattr(self, "_needs_seed", False) and t >= self.active_from - 1e-9:
            x, y, ids = self.reseed_fn(conc)
            self.x, self.y, self.ids = x, y, self._fresh_ids(ids)
            self.alive = np.ones_like(self.x, dtype=bool)
            self._needs_seed = False
            return True
        if t < self.active_from + self.lifetime_days - 1e-9:
            return False
        x, y, ids = self.reseed_fn(conc)
        self.x, self.y, self.ids = x, y, self._fresh_ids(ids)
        self.alive = np.ones_like(self.x, dtype=bool)
        # advance to the window containing t, staying on the schedule
        # (reference restarts the 48 h window at expiry, not at check time)
        self.active_from += self.lifetime_days * np.floor(
            (t - self.active_from) / self.lifetime_days + 1e-9
        )
        return True

    def _fresh_ids(self, ids: np.ndarray) -> np.ndarray:
        """Globally-unique ids for a re-seeded window. The seeding helper
        numbers buoys 0..n-1 from whatever cells pass the conc limit, so a
        new window's id k is a DIFFERENT physical buoy than the last
        window's id k; trajectory outputs must never join them into one
        column (found by the round-4 operational demo: write_netcdf KeyError
        on a reseeded OSISAF id)."""
        base = getattr(self, "_next_id", None)
        if base is None:
            base = int(self.ids.max()) + 1 if self.ids.size else 0
        out = base + np.arange(len(ids), dtype=np.int64)
        self._next_id = base + len(ids)
        return out

    # ------------------------------------------------------------------
    @staticmethod
    def equally_spaced(grid, spacing_m: float, conc, conc_limit: float,
                       output_dt_days: float, time_init: float) -> "DrifterSet":
        """(reference: drifters.hpp:38-43 'spacing' init): buoys on a regular
        grid where conc > limit."""
        x0 = grid.x0 + 0.5 * spacing_m
        y0 = grid.y0 + 0.5 * spacing_m
        nx = int(grid.nx * grid.dx / spacing_m)
        ny = int(grid.ny * grid.dx / spacing_m)
        xs, ys = np.meshgrid(x0 + np.arange(nx) * spacing_m, y0 + np.arange(ny) * spacing_m)
        xs, ys = xs.ravel(), ys.ravel()
        c = _sample(grid, np.asarray(conc), xs, ys, cell=True)
        keep = c > conc_limit
        ids = np.arange(keep.sum())
        d = DrifterSet("equally_spaced", xs[keep], ys[keep], ids, grid,
                       conc_limit, output_dt_days, time_init)
        return d

    @staticmethod
    def from_text_file(tag: str, path: str, grid, conc, conc_limit: float,
                       output_dt_days: float, time_init: float) -> "DrifterSet":
        """Read 'id lat lon' (SIDFEx-style buoy list; reference:
        drifters.cpp initFromTextFile)."""
        ids, lats, lons = [], [], []
        with open(path) as f:
            for line in f:
                parts = line.split()
                if len(parts) < 3 or parts[0].startswith("#"):
                    continue
                ids.append(int(float(parts[0])))
                lats.append(float(parts[1]))
                lons.append(float(parts[2]))
        x, y = grid.projection.forward(np.asarray(lats), np.asarray(lons))
        d = DrifterSet(tag, np.asarray(x), np.asarray(y), np.asarray(ids), grid,
                       conc_limit, output_dt_days, time_init)
        c = _sample(grid, np.asarray(conc), d.x, d.y, cell=True)
        d.alive = c > conc_limit
        return d

    # ------------------------------------------------------------------
    def move(self, vt_u: np.ndarray, vt_v: np.ndarray, dt: float):
        """Advance positions by dt seconds with bilinear node-velocity
        sampling (reference: Drifters::move, drifters.cpp)."""
        u = _sample(self.grid, vt_u, self.x, self.y, cell=False)
        v = _sample(self.grid, vt_v, self.x, self.y, cell=False)
        self.x = np.where(self.alive, self.x + dt * u, self.x)
        self.y = np.where(self.alive, self.y + dt * v, self.y)

    def move_by_displacement(self, dut_u: np.ndarray, dut_v: np.ndarray):
        """Advance positions by the accumulated displacement field since the
        last drifter update — the reference's actual scheme: buoys move with
        M_UT between drifter outputs (reference: checkMoveDrifters
        fe.cpp:8375-8403, Drifters::move). One host sync per drifter output
        instead of one per model step."""
        du = _sample(self.grid, dut_u, self.x, self.y, cell=False)
        dv = _sample(self.grid, dut_v, self.x, self.y, cell=False)
        self.x = np.where(self.alive, self.x + du, self.x)
        self.y = np.where(self.alive, self.y + dv, self.y)

    def mask_by_conc(self, conc: np.ndarray):
        c = _sample(self.grid, conc, self.x, self.y, cell=True)
        self.alive &= c > self.conc_limit

    def maybe_output(self, t: float):
        if t - self._last_output >= self.output_dt_days - 1e-9:
            self._last_output = t
            lat, lon = self.grid.projection.inverse(self.x, self.y)
            self.records.append(
                dict(time=t, ids=self.ids[self.alive].copy(),
                     lat=np.asarray(lat)[self.alive].copy(),
                     lon=np.asarray(lon)[self.alive].copy())
            )

    def write_text(self, path: str):
        """IABP-style text output (reference: drifters.cpp outputting)."""
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            f.write("year month day hour BuoyID lat lon\n")
            for rec in self.records:
                d = dates.datenum_to_datetime(rec["time"])
                for i, la, lo in zip(rec["ids"], rec["lat"], rec["lon"]):
                    f.write(
                        f"{d.year} {d.month} {d.day} {d.hour} {i} "
                        f"{la:.6f} {lo:.6f}\n"
                    )

    def write_netcdf(self, path: str):
        from scipy.io import netcdf_file

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        nrec = len(self.records)
        # columns = the union of every id ever recorded (finite-lifetime
        # sets re-seed with fresh ids, so the live set is only the last
        # window's buoys); current ids included so a no-record set still
        # writes its seeding
        all_ids = sorted(
            {int(i) for rec in self.records for i in rec["ids"]}
            | {int(i) for i in self.ids}
        )
        buoy_ids = np.asarray(all_ids, np.int64)
        nbuoy = len(buoy_ids)
        lat = np.full((nrec, nbuoy), np.nan, np.float32)
        lon = np.full((nrec, nbuoy), np.nan, np.float32)
        times = np.zeros(nrec)
        id_index = {int(i): k for k, i in enumerate(buoy_ids)}
        for r, rec in enumerate(self.records):
            times[r] = rec["time"]
            for i, la, lo in zip(rec["ids"], rec["lat"], rec["lon"]):
                k = id_index[int(i)]
                lat[r, k] = la
                lon[r, k] = lo
        with netcdf_file(path, "w", version=2) as nc:
            nc.createDimension("time", None)
            nc.createDimension("buoy", nbuoy)
            tv = nc.createVariable("time", "f8", ("time",))
            tv.units = b"days since 1900-01-01 00:00:00"
            tv[:] = times
            iv = nc.createVariable("BuoyID", "i4", ("buoy",))
            iv[:] = buoy_ids.astype(np.int32)
            for nm, arr, unit in (("latitude", lat, b"degrees_north"),
                                  ("longitude", lon, b"degrees_east")):
                v = nc.createVariable(nm, "f4", ("time", "buoy"))
                v.units = unit
                v[:] = arr


def _sample(grid, field: np.ndarray, xq, yq, cell: bool) -> np.ndarray:
    """Bilinear sample a cell- or node-registered field at points."""
    if cell:
        x0 = grid.x0 + 0.5 * grid.dx
        y0 = grid.y0 + 0.5 * grid.dx
        ny, nx = grid.shape
    else:
        x0, y0 = grid.x0, grid.y0
        ny, nx = grid.node_shape
    fx = np.clip((np.asarray(xq) - x0) / grid.dx, 0.0, nx - 1.0)
    fy = np.clip((np.asarray(yq) - y0) / grid.dx, 0.0, ny - 1.0)
    i0 = np.floor(fx).astype(int)
    j0 = np.floor(fy).astype(int)
    i1 = np.minimum(i0 + 1, nx - 1)
    j1 = np.minimum(j0 + 1, ny - 1)
    wx = fx - i0
    wy = fy - j0
    f = np.asarray(field)
    return (
        f[j0, i0] * (1 - wx) * (1 - wy)
        + f[j0, i1] * wx * (1 - wy)
        + f[j1, i0] * (1 - wx) * wy
        + f[j1, i1] * wx * wy
    )


def instantiate_drifters(cfg, grid, conc, time_init: float) -> List[DrifterSet]:
    """All five reference drifter flavours (reference: instantiateDrifters,
    fe.cpp:13565-13735): equally-spaced, SIDFEx, IABP (transient), OSISAF
    (62.5 km grid, optionally refined x9), RGPS (text file)."""
    out: List[DrifterSet] = []
    limit = cfg["drifters.concentration_limit"]
    if cfg["drifters.use_equally_spaced_drifters"]:
        d = DrifterSet.equally_spaced(
            grid, cfg["drifters.spacing"] * 1e3, conc, limit,
            cfg["drifters.equally_spaced_drifters_output_time_step"], time_init,
        )
        d.ignore_restart = cfg["drifters.equally_spaced_ignore_restart"]
        out.append(d)
    if cfg["drifters.use_sidfex_drifters"] and cfg["drifters.sidfex_filename"]:
        d = DrifterSet.from_text_file(
            "sidfex", cfg["drifters.sidfex_filename"], grid, conc, limit,
            cfg["drifters.sidfex_drifters_output_time_step"], time_init,
        )
        # fixed init time (reference: TimingInfo fixed-init, fe.cpp:13700+)
        tstr = cfg["drifters.sidfex_time_init"]
        if tstr:
            d.active_from = max(time_init, dates.string_to_datenum(tstr))
            d._last_output = d.active_from
        d.ignore_restart = cfg["drifters.sidfex_ignore_restart"]
        out.append(d)
    if cfg["drifters.use_iabp_drifters"]:
        path = os.path.join(os.environ.get("NEXTSIM_DATA_DIR", "."), "IABP_buoys.txt")
        if os.path.exists(path):
            d = TransientDrifterSet(
                "iabp", path, grid, limit,
                cfg["drifters.iabp_drifters_output_time_step"], time_init,
            )
            d.update_transient(time_init, np.asarray(conc))
            d.ignore_restart = cfg["drifters.iabp_ignore_restart"]
            out.append(d)
    if cfg["drifters.use_osisaf_drifters"]:
        out.extend(osisaf_drifters(
            grid, conc, limit, time_init,
            refined=cfg["drifters.use_refined_osisaf_grid"],
            output_dt_days=cfg["drifters.osisaf_drifters_output_time_step"],
        ))
    if cfg["drifters.use_rgps_drifters"]:
        # reference: RGPS_<drifters.RGPS_time_init>.txt under the data dir,
        # buoys fixed-initialised at that time (fe.cpp:13644-13660)
        data_dir = os.environ.get("NEXTSIM_DATA_DIR", ".")
        tstr = cfg["drifters.RGPS_time_init"]
        path = os.path.join(data_dir, f"RGPS_{tstr}.txt")
        if not os.path.exists(path):
            path = os.path.join(data_dir, "RGPS_buoys.txt")  # generic fallback
        if os.path.exists(path):
            d = DrifterSet.from_text_file(
                "rgps", path, grid, conc, limit,
                cfg["drifters.rgps_drifters_output_time_step"], time_init,
            )
            if tstr:
                d.active_from = max(time_init, dates.string_to_datenum(tstr))
                d._last_output = d.active_from
            out.append(d)
    return out


class TransientDrifterSet(DrifterSet):
    """IABP-style transient drifters (reference: drifters.cpp transient
    logic, drifters.hpp:129-155): an input file of dated position reports
    'year month day hour id lat lon'; buoys are added when they first
    appear and removed when the input stops reporting them (or they leave
    the ice)."""

    def __init__(self, tag, path, grid, conc_limit, output_dt_days, time_init):
        super().__init__(tag, np.zeros(0), np.zeros(0), np.zeros(0, np.int64),
                         grid, conc_limit, output_dt_days, time_init)
        self.reports = self._read_reports(path)  # time -> {id: (lat, lon)}
        self._check_time = time_init

    @staticmethod
    def _read_reports(path):
        reports = {}
        with open(path) as f:
            for line in f:
                parts = line.split()
                if len(parts) < 7 or not parts[0].isdigit():
                    continue
                y, mo, d, h = (int(p) for p in parts[:4])
                bid = int(float(parts[4]))
                lat, lon = float(parts[5]), float(parts[6])
                import datetime as _dt

                t = dates.datetime_to_datenum(_dt.datetime(y, mo, d, h))
                reports.setdefault(round(t, 6), {})[bid] = (lat, lon)
        return dict(sorted(reports.items()))

    def update_transient(self, t: float, conc: np.ndarray):
        """Add newly-reported buoys; drop buoys no longer reported
        (reference: drifters.cpp:56-70 'ones which IABP doesn't report...')."""
        times = [tt for tt in self.reports if tt <= t + 1e-6]
        if not times:
            return
        current = self.reports[times[-1]]
        live_ids = set(current.keys())
        # drop unreported
        keep = np.array([int(i) in live_ids for i in self.ids], bool)
        self.x, self.y = self.x[keep], self.y[keep]
        self.ids, self.alive = self.ids[keep], self.alive[keep]
        # add new
        known = set(int(i) for i in self.ids)
        new = [(i, ll) for i, ll in current.items() if i not in known]
        if new:
            lats = np.array([ll[0] for _, ll in new])
            lons = np.array([ll[1] for _, ll in new])
            nx, ny_ = self.grid.projection.forward(lats, lons)
            c = _sample(self.grid, conc, np.asarray(nx), np.asarray(ny_), cell=True)
            self.x = np.concatenate([self.x, np.asarray(nx)])
            self.y = np.concatenate([self.y, np.asarray(ny_)])
            self.ids = np.concatenate([self.ids, np.array([i for i, _ in new])])
            self.alive = np.concatenate([self.alive, c > self.conc_limit])


def osisaf_drifters(grid, conc, conc_limit, time_init, refined: bool = False,
                    output_dt_days: float = 2.0):
    """OSISAF drift-product drifters (reference: instantiateDrifters
    fe.cpp:13574-13618): TWO staggered sets on the OSISAF 62.5 km grid
    (optionally refined x9, i.e. 1/3 spacing), each starting at 12:00 on
    consecutive days with a 2-day lifetime — on expiry a set re-seeds from
    the grid wherever conc exceeds the limit, reproducing the product's
    rolling 48 h drift-pair windows."""
    spacing = 62.5e3 / (3.0 if refined else 1.0)
    out = []
    for i in range(2):
        d = DrifterSet.equally_spaced(
            grid, spacing, conc, conc_limit, output_dt_days, time_init
        )
        d.tag = f"osisaf{i}"
        # start at 12:00, staggered by one day (fe.cpp:13598-13608)
        d.active_from = float(np.ceil(time_init)) + 0.5 + i
        d._last_output = d.active_from
        d.lifetime_days = 2.0
        d._needs_seed = d.active_from > time_init + 1e-9  # seed at activation

        def reseed(c, _g=grid, _s=spacing, _lim=conc_limit):
            nd = DrifterSet.equally_spaced(_g, _s, c, _lim, 1.0, 0.0)
            return nd.x, nd.y, nd.ids

        d.reseed_fn = reseed
        out.append(d)
    return out
