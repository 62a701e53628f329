"""Offline driver CLI: spartacus_surface config.nam input.nc output.nc.

Parity: program spartacus_surface_driver,
driver/spartacus_surface_driver.F90:20-302 — same three arguments, namelist
handling, benchmark repetition (nrepeat), column-range selection, flux
scaling/summation, optional conservation check and output writing.  Where
the reference parallelizes over OpenMP column blocks
(spartacus_surface_driver.F90:199-234), this driver runs the whole column
batch as jitted device computations (optionally sharded over a device mesh;
see parallel/mesh.py).

Precision: double by default to match the reference's jprb; pass
--precision=single for the TPU-native fast path (reference supports the
same choice via -DSINGLE_PRECISION, Makefile:42-44).
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def build_argparser():
    p = argparse.ArgumentParser(
        prog="spartacus_surface",
        description=(
            "SPARTACUS-Surface offline radiation scheme (TPU-native build)"
        ),
    )
    p.add_argument("namelist", help="Namelist configuration file")
    p.add_argument("input", help="Input NetCDF file")
    p.add_argument("output", help="Output NetCDF file")
    p.add_argument(
        "--precision", choices=("double", "single"), default="double",
        help="Working precision (double matches the reference default)",
    )
    p.add_argument(
        "--profile", metavar="DIR", default=None,
        help="Capture a JAX/TPU profiler trace of the solve into DIR and"
             " print per-region wall times (the reference's Dr-Hook/"
             "GPROF equivalents, Makefile_include.gfortran:40-43)",
    )
    p.add_argument(
        "--column-chunk", type=int, default=None, metavar="N",
        help="Solve in column chunks of N (bounds the accelerator HBM"
             " working set for very large inputs; the TPU analogue of the"
             " reference's nblocksize OpenMP blocking). Default: whole"
             " batch, or the `column_chunk` namelist extension.",
    )
    p.add_argument(
        "--stream-chunk", type=int, default=None, metavar="N",
        help="Stream the solve over column chunks of N with double-"
             "buffered host->device transfer overlapping compute (for"
             " datasets larger than device/host memory; outputs are"
             " fetched per chunk and reassembled on the host). Differs"
             " from --column-chunk, which keeps everything device-resident"
             " inside one program.",
    )
    p.add_argument(
        "--netcdf4", action="store_true",
        help="Write the output as NetCDF4/HDF5 via the native libnetcdf"
             " backend (default: NetCDF3 classic, as the reference driver)",
    )
    p.add_argument(
        "--mesh", default="auto", metavar="auto|off|N",
        help="Device-mesh column sharding: 'auto' (default) builds a 1-D"
             " mesh over all local devices when more than one is visible,"
             " 'off' forces single-device, an integer N uses the first N"
             " devices. The TPU-native equivalent of the reference's OpenMP"
             " column blocks (spartacus_surface_driver.F90:199-234).",
    )
    p.add_argument(
        "--platform", choices=("default", "cpu", "tpu"), default="default",
        help=(
            "JAX platform; 'default' uses whatever the environment provides"
            " (TPU when available). Double precision on TPU is software-"
            "emulated and slow; prefer --precision=single there."
        ),
    )
    p.add_argument(
        "--coordinator", default=None, metavar="HOST:PORT",
        help="jax.distributed coordinator address for multi-process runs"
             " (the process-level analogue of the reference's OpenMP"
             " do_parallel; each process solves its own contiguous column"
             " slice and writes OUTPUT.pNN)",
    )
    p.add_argument(
        "--num-processes", type=int, default=None, metavar="N",
        help="Total process count for --coordinator runs",
    )
    p.add_argument(
        "--process-id", type=int, default=None, metavar="I",
        help="This process's rank (0-based) for --coordinator runs",
    )
    p.add_argument(
        "--keep-shards", action="store_true",
        help="Multi-process runs: keep the per-process OUTPUT.pNN shards"
             " after process 0 merges them into the single OUTPUT file",
    )
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)

    import jax

    if args.platform != "default":
        jax.config.update("jax_platforms", args.platform)
    if args.precision == "double":
        jax.config.update("jax_enable_x64", True)

    # Multi-process bootstrap (must precede any backend use).  Explicit
    # flags take precedence; otherwise fall back to cluster env
    # auto-detection inside jax.distributed (SLURM and friends).
    if args.num_processes is not None and args.num_processes > 1:
        from ..parallel.distributed import initialize

        initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    import numpy as np

    from ..models import flux_utils
    from ..models.dispatch import TILE_NAMES, run_radsurf
    from ..models.simple_spectrum import calc_simple_spectrum_lw
    from ..utils import profiling
    from ..utils.config import Config, DriverConfig
    from .read_input import read_input
    from .save import save_canopy_fluxes

    if not os.path.exists(args.namelist):
        print(f'*** Error: namelist file "{args.namelist}" not found',
              file=sys.stderr)
        return 1
    if not os.path.exists(args.input):
        print(f'*** Error: input file "{args.input}" not found',
              file=sys.stderr)
        return 1

    config = Config.from_namelist(args.namelist)
    if args.column_chunk is not None:
        config.column_chunk = args.column_chunk
    driver_config = DriverConfig.from_namelist(args.namelist)
    iverbose = driver_config.iverbose
    if args.profile:
        profiling.enabled = True
        profiling.start_trace(args.profile)

    def log(*a, level=2):
        if iverbose >= level:
            print(*a)

    log("------------------ OFFLINE SPARTACUS-SURFACE RADIATION SCHEME"
        " (TPU) ------------------")
    log(f"Floating-point precision: {args.precision}")
    config.consolidate()
    # Config echo at iverbose >= 2 (radsurf_config.F90:275-362, called from
    # spartacus_surface_driver.F90 after consolidate)
    config.print_config(iverbose=iverbose)

    try:
        with profiling.hook("read_input"):
            data = read_input(args.input, config, driver_config,
                              verbose_print=log)
    except KeyError as exc:
        print(f"*** Error reading {args.input}: {exc}", file=sys.stderr)
        return 1
    arrays = data["arrays"]
    ncol = data["ncol"]

    # Multi-process execution: each host handles its own contiguous slice
    # of columns end-to-end (columns are embarrassingly parallel; the
    # reference's OpenMP loop has no inter-column coupling).  Output files
    # then carry a .pNN suffix per process.
    proc_suffix = ""
    if jax.process_count() > 1:
        from ..parallel.distributed import host_column_slice

        hsl = host_column_slice(ncol)
        for key, val in list(arrays.items()):
            arrays[key] = val[hsl]
        for key in ("top_flux_dn_sw", "top_flux_dn_direct_sw",
                    "top_flux_dn_lw"):
            if data[key] is not None:
                data[key] = data[key][hsl]
        ncol = hsl.stop - hsl.start
        proc_suffix = f".p{jax.process_index():02d}"
        log(f"Process {jax.process_index()}/{jax.process_count()}:"
            f" columns {hsl.start + 1} to {hsl.stop}")

    # Device mesh over the column axis (parallel/mesh.py)
    mesh = None
    if args.mesh != "off":
        from ..parallel.mesh import make_mesh

        n_local = len(jax.local_devices())
        if args.mesh == "auto":
            if n_local > 1:
                mesh = make_mesh(devices=jax.local_devices())
        else:
            mesh = make_mesh(int(args.mesh))
        if mesh is not None:
            log(f"Parallel: sharding columns over {mesh.devices.size}"
                f" devices (mesh axes {dict(zip(mesh.axis_names, mesh.devices.shape))})")

    # Column-range selection (spartacus_surface_driver.F90:153-164)
    icol1 = driver_config.istartcol
    icol2 = driver_config.iendcol
    if icol2 < 1 or icol2 > ncol:
        icol2 = ncol
    if icol1 > icol2:
        print(
            f"*** Error: requested column range ({icol1} to "
            f"{driver_config.iendcol}) is out of the range in the data"
            f" (1 to {ncol})",
            file=sys.stderr,
        )
        return 1
    if (icol1, icol2) != (1, ncol):
        sel = slice(icol1 - 1, icol2)
        for key, val in list(arrays.items()):
            arrays[key] = val[sel]
        for key in ("top_flux_dn_sw", "top_flux_dn_direct_sw",
                    "top_flux_dn_lw"):
            if data[key] is not None:
                data[key] = data[key][sel]
        ncol = icol2 - icol1 + 1

    if config.do_lw:
        calc_simple_spectrum_lw(config, arrays)

    if iverbose >= 4:
        # Per-column representation trace (radsurf_interface.F90:126-128,
        # 176-181 at iverbose >= 4)
        for jcol, code in enumerate(arrays["i_representation"], start=1):
            print(f"{jcol:5d}: {TILE_NAMES.get(int(code), '?')},"
                  f" {int(arrays['nlay'][jcol - 1])} layers")

    sw_flux = lw_flux = None
    tstart = time.perf_counter()
    for _ in range(max(1, driver_config.nrepeat)):
        with profiling.hook("radsurf"):
            if args.stream_chunk:
                from ..parallel.streaming import stream_columns

                result = stream_columns(
                    lambda a: run_radsurf(config, a, mesh=mesh),
                    arrays, args.stream_chunk,
                )
            else:
                result = run_radsurf(config, arrays, mesh=mesh)
        if config.do_sw:
            sw_norm_dir = flux_utils.scale_flux(
                result["sw_norm_dir"], data["top_flux_dn_direct_sw"]
            )
            sw_norm_diff = flux_utils.scale_flux(
                result["sw_norm_diff"],
                data["top_flux_dn_sw"] - data["top_flux_dn_direct_sw"],
            )
            sw_flux = flux_utils.sum_flux(sw_norm_dir, sw_norm_diff)
        if config.do_lw:
            lw_norm = flux_utils.scale_flux(
                result["lw_norm"], data["top_flux_dn_lw"]
            )
            lw_flux = flux_utils.sum_flux(result["lw_internal"], lw_norm)
        # Results are asynchronous device arrays; block for honest timing
        # (the reference's omp_get_wtime brackets the complete solve).
        jax.block_until_ready((sw_flux, lw_flux))
    elapsed = time.perf_counter() - tstart
    log(f"Time elapsed in radiative transfer: {elapsed:g} seconds")

    if driver_config.do_conservation_check:
        if config.do_sw:
            print("Direct shortwave budget: radiation originating from"
                  " direct solar at canopy top")
            flux_utils.check_flux(result["sw_norm_dir"], arrays, "sw_dir")
            print("Diffuse shortwave budget: radiation originating from"
                  " downward diffuse solar at canopy top")
            flux_utils.check_flux(result["sw_norm_diff"], arrays, "sw_diff")
        if config.do_lw:
            print("Internal longwave budget: radiation originating from"
                  " emission within canopy")
            flux_utils.check_flux(result["lw_internal"], arrays, "lw_int")
            print("Incoming longwave budget: radiation originating from"
                  " downward longwave at canopy top")
            flux_utils.check_flux(result["lw_norm"], arrays, "lw_norm")

    with profiling.hook("save"):
        save_canopy_fluxes(args.output + proc_suffix, config, arrays,
                           sw_flux, lw_flux,
                           iverbose=iverbose, is_hdf5_file=args.netcdf4)
    if jax.process_count() > 1:
        # One output file, always — the reference driver's contract
        # (radsurf_save.F90:26): barrier until every process has written
        # its shard, then process 0 merges OUTPUT.pNN -> OUTPUT.
        from ..parallel.distributed import barrier

        from .merge import merge_shards

        barrier("spartacus_shards_written")
        if jax.process_index() == 0:
            merge_shards(args.output, n_processes=jax.process_count(),
                         delete=not args.keep_shards,
                         is_hdf5_file=args.netcdf4)
            log(f"Merged {jax.process_count()} output shards into"
                f" {args.output}")
    if args.profile:
        profiling.stop_trace()
        profiling.report()
        log(f"Profiler trace written to {args.profile}")
    log("-----------------------------------------------------------------"
        "---------------")
    return 0


if __name__ == "__main__":
    sys.exit(main())
