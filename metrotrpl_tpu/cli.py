"""Command-line entry points.

Subcommand equivalents of the reference entry scripts:

    python -m metrotrpl_tpu.cli mcmc  <config.txt>   (reference main.py)
    python -m metrotrpl_tpu.cli dense <config.txt>   (run_dense_sampler.py)
    python -m metrotrpl_tpu.cli mle   <config.txt>   (run_max_likelihood.py)
    python -m metrotrpl_tpu.cli write-example <out.txt>  (MCMC_script_writer)

All consume the reference's MCMC config-script format.
"""

import argparse
import os
import sys

import numpy as np


def _load_common(script_path):
    from metrotrpl_tpu.config import (
        get_data,
        get_initpoints,
        read_config,
    )

    # Honor the user's JAX_PLATFORMS choice even when a sitecustomize has
    # already pinned a different platform at interpreter startup (env vars
    # are only read once by jax, so re-assert through the config API).
    # Done here — not in main() — so jax-free subcommands (convert-config,
    # write-example) never pay the jax import.
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)

    sim_info, param_info, meas_flags, MCMC_fields = read_config(script_path)
    iniPar = get_initpoints(MCMC_fields["init_cond_path"], meas_flags)
    e_data = get_data(MCMC_fields["measurement_path"], meas_flags,
                      MCMC_fields)
    return sim_info, param_info, meas_flags, MCMC_fields, iniPar, e_data


def _resolve_jobid(args):
    """Reference main.py:18-24: when no explicit --jobid is given, fall
    back to the SLURM array task id (0 outside SLURM)."""
    if args.jobid is not None:
        return args.jobid
    try:
        return int(os.environ["SLURM_ARRAY_TASK_ID"])
    except (KeyError, ValueError):
        return 0


def _resolve_config(path, jobid):
    """Reference main.py:27 semantics: the config argument may be a script
    HEADER, resolved as ``{header}{jobid}.txt`` (the MCMC_script_writer
    per-array-task convention). An existing literal path always wins."""
    if not os.path.exists(path):
        cand = f"{path}{jobid}.txt"
        if os.path.exists(cand):
            return cand
    return path


def cmd_mcmc(args):
    from metrotrpl_tpu.inference import metro

    jobid = _resolve_jobid(args)
    (sim_info, param_info, _meas, MCMC_fields,
     iniPar, e_data) = _load_common(_resolve_config(args.config, jobid))
    n_ens = getattr(args, "ensembles", 1)
    # reference main.py:36 seeds with the jobid; our keyed-stream
    # equivalent. With --ensembles E, array task J covers replica jobids
    # J*E .. J*E+E-1, so concurrent SLURM-array tasks sharing an
    # output_path get disjoint RNG streams AND disjoint CPU{j}-final.pik
    # filenames (no clobbering, no bit-identical duplicate walks).
    jobids = [jobid * n_ens + e for e in range(n_ens)]
    # args.seed + j (NOT j - jobids[0]: that would cancel the per-task
    # offset and hand every array task identical streams)
    seeds = [args.seed + j if args.seed is not None
             else (j or 235817049752375780) for j in jobids]
    export_path = f"CPU{jobids[0]}-final.pik"
    mesh_shape = None
    if getattr(args, "mesh", None):
        d_e, _, d_c = args.mesh.lower().partition("x")
        mesh_shape = (int(d_e), int(d_c))
    metro(sim_info, iniPar, e_data, MCMC_fields, param_info,
          verbose=args.verbose, export_path=export_path,
          logger_name=f"Ensemble{jobid}", seed=seeds[0],
          # sharded runs use ONE shared seed (per-ensemble streams derive
          # by fold_in inside the kernel — mh_core.py RNG discipline)
          seeds=None if mesh_shape else seeds,
          export_paths=[f"CPU{j}-final.pik" for j in jobids],
          irf_dir=args.irf_dir, n_ensembles=n_ens, mesh_shape=mesh_shape)
    if n_ens > 1:
        outs = ", ".join(f"CPU{j}-final.pik" for j in jobids)
        print(f"Done. Outputs in {MCMC_fields['output_path']}: {outs}")
    else:
        print(f"Done. Output: "
              f"{os.path.join(MCMC_fields['output_path'], export_path)}")


def cmd_dense(args):
    from metrotrpl_tpu.inference.dense import bayes, export
    from metrotrpl_tpu.io.logging import start_logging, stop_logging
    from metrotrpl_tpu.ops.convolve import load_irf_tables

    jobid = _resolve_jobid(args)
    (sim_info, param_info, _meas, MCMC_fields,
     iniPar, e_data) = _load_common(_resolve_config(args.config, jobid))
    logger, handler = start_logging(
        log_dir=MCMC_fields["output_path"], name=f"Dense{jobid}",
        verbose=args.verbose)
    if MCMC_fields.get("irf_convolution", None) is not None:
        MCMC_fields["_IRF_tables"] = load_irf_tables(
            MCMC_fields["irf_convolution"], args.irf_dir)
    N, P, X = bayes(None, None, iniPar, sim_info, e_data, MCMC_fields,
                    param_info, logger=logger, seed=jobid)
    out = os.path.join(MCMC_fields["output_path"], f"CPU{jobid}")
    export(out, P, X, logger=logger)
    stop_logging(logger, handler)
    print(f"Done. Output: {out}_P.npy / {out}_X.npy")


def cmd_mle(args):
    from metrotrpl_tpu.inference.mle import mle
    from metrotrpl_tpu.io.logging import start_logging, stop_logging
    from metrotrpl_tpu.ops.convolve import load_irf_tables

    jobid = _resolve_jobid(args)
    (sim_info, param_info, _meas, MCMC_fields,
     iniPar, e_data) = _load_common(_resolve_config(args.config, jobid))
    logger, handler = start_logging(
        log_dir=MCMC_fields["output_path"], name=f"MLE{jobid}",
        verbose=args.verbose)
    if MCMC_fields.get("irf_convolution", None) is not None:
        MCMC_fields["_IRF_tables"] = load_irf_tables(
            MCMC_fields["irf_convolution"], args.irf_dir)
    mle(e_data, sim_info, param_info, iniPar, MCMC_fields,
        f"MLE{jobid}-final.pik", logger, maxiter=args.maxiter)
    stop_logging(logger, handler)
    print("Done.")


def _resolve_out(args):
    """Reference MCMC_script_writer.py:41: an ``out`` argument without a
    .txt suffix is a script header; the file written is
    ``{header}{jobid}.txt`` (one config per SLURM array task)."""
    if args.out.endswith(".txt"):
        return args.out
    return f"{args.out}{_resolve_jobid(args)}.txt"


def cmd_write_example(args):
    """Generate the staub-MAPI example config (reference
    MCMC_script_writer.py:46-156 settings)."""
    from metrotrpl_tpu.config import generate_config_script_file

    args.out = _resolve_out(args)
    names = ["n0", "p0", "mu_n", "mu_p", "ks", "Cn", "Cp", "Sf", "Sb",
             "tauN", "tauP", "eps", "Tm"]
    simPar = {"lengths": [311, 2000, 311, 2000, 311, 2000],
              "nx": [128] * 6, "meas_types": ["TRPL"] * 6, "num_meas": 6}
    param_info = {
        "names": names,
        "unit_conversions": {"n0": 1e-21, "p0": 1e-21, "mu_n": 1e5,
                             "mu_p": 1e5, "ks": 1e12, "Cn": 1e33,
                             "Cp": 1e33, "Sf": 1e-2, "Sb": 1e-2, "Tm": 1},
        "do_log": {n: 1 for n in names},
        "active": {n: (0 if n in ("n0", "eps", "Tm") else 1) for n in names},
        "init_guess": {"n0": 1e8, "p0": 3e15, "mu_n": 20, "mu_p": 20,
                       "ks": 4.8e-11, "Cn": 4.4e-29, "Cp": 4.4e-29,
                       "Sf": 10, "Sb": 10, "tauN": 511, "tauP": 871,
                       "eps": 10, "Tm": 300},
        "prior_dist": {"n0": (0, np.inf), "p0": (1e14, 1e16),
                       "mu_n": (1e0, 1e2), "mu_p": (1e0, 1e2),
                       "ks": (1e-11, 1e-9), "Cn": (1e-29, 1e-27),
                       "Cp": (1e-29, 1e-27), "Sf": (1e-1, 1e4),
                       "Sb": (1e-1, 1e4), "tauN": (1, 2e3),
                       "tauP": (1, 1e4), "eps": (0, np.inf),
                       "Tm": (0, np.inf)},
        "trial_move": {n: 0.003 for n in names},
    }
    # data is synthesized at the TRUE parameters below; the walk starts
    # from randomized guesses (reference MCMC_script_writer.py:120-122)
    true_guess = dict(param_info["init_guess"])
    rng = np.random.default_rng(42)
    for n in names:
        if param_info["active"][n]:
            param_info["init_guess"][n] *= 10.0 ** rng.uniform(-0.3, 0.3)

    meas_fields = {"time_cutoff": [0, 2000], "select_obs_sets": None}
    MCMC_fields = {
        "init_cond_path": args.init_cond or os.path.join(
            "Inputs", "staub_MAPI_threepower_twothick_fluences.csv"),
        "measurement_path": args.measurement or os.path.join(
            "Inputs", "staub_MAPI_threepower_twothick_nonoise.csv"),
        "output_path": args.output or os.path.join("bay_outputs", "run0"),
        "ini_mode": "fluence",
        "num_iters": args.num_iters,
        # --fast: the TPU-native fast integration mode at the hmax
        # validated for this workload (accuracy scripts/probe_r3_cheap.py,
        # posterior docs/POSTERIOR_r03_h48.md); default keeps the
        # reference writer's solver choice verbatim
        **({"solver": ("sdirk",), "hmax": 48.0, "refactor_every": 4}
           if getattr(args, "fast", False) else {"solver": ("solveivp",)}),
        "model": "std",
        "model_uncertainty": 1,
        "log_y": 1,
        "scale_factor": None,
        "irf_convolution": None,
        "parallel_tempering": [1., 2., 4., 8., 16., 32., 64., 128.],
        "temper_freq": 10,
        "hard_bounds": 1,
        "force_min_y": 0,
        "checkpoint_freq": 1000,
        "load_checkpoint": None,
    }
    generate_config_script_file(args.out, simPar, param_info, meas_fields,
                                MCMC_fields, verbose=True)
    print(f"Wrote {args.out}")

    # Turnkey: synthesize the measurement data with the float64 LSODA
    # oracle at the (pre-randomization) true parameters if it's missing
    # (the reference's staub 'nonoise' dataset is synthetic and unshipped).
    mpath = MCMC_fields["measurement_path"]
    ipath = MCMC_fields["init_cond_path"]
    if not os.path.exists(ipath):
        os.makedirs(os.path.dirname(ipath) or ".", exist_ok=True)
        flu = np.array([[2.12e11, 6e4, 1], [2.12e11, 6e4, 1],
                        [6.36e11, 6e4, 1], [6.36e11, 6e4, 1],
                        [1.91e12, 6e4, 1], [1.91e12, 6e4, 1]])
        np.savetxt(ipath, flu, delimiter=",")
        print(f"Wrote synthetic fluences: {ipath}")
    if not os.path.exists(mpath):
        from metrotrpl_tpu.oracle import solve_reference
        from metrotrpl_tpu.oracle.scipy_reference import beer_lambert

        flu = np.loadtxt(ipath, delimiter=",")
        uc = param_info["unit_conversions"]
        pm = {k: v * uc.get(k, 1) for k, v in true_guess.items()}
        t = np.linspace(0, 2000, 501)
        rows = []
        for m in range(simPar["num_meas"]):
            th = simPar["lengths"][m]
            nx = simPar["nx"][m]
            dx = th / nx
            x = np.linspace(dx / 2, th - dx / 2, nx)
            ic = beer_lambert(flu[m, 0] * 1e-14, flu[m, 1] * 1e-7, x)
            pl = solve_reference(ic, th, nx, t, pm)
            rows.append(np.stack([t, pl, 0.02 * pl], axis=1))
        os.makedirs(os.path.dirname(mpath) or ".", exist_ok=True)
        np.savetxt(mpath, np.concatenate(rows), delimiter=",")
        print(f"Wrote synthetic measurement data: {mpath}")


def cmd_write_real_example(args):
    """Generate a config fitting the vendored REAL measured staub MAPI
    dataset (the reference's actual scientific use case):
    `Inputs/real_staub_aug_corr_renoised.csv` — 3 excitation powers at
    311 nm, 141 points to 4248 ns each, absolute-units TRPL — with
    density-mode initial profiles from `Inputs/real_staub_input.csv`
    (reference Inputs/ assets; see docs/REAL_DATA.md walkthrough).

    --irf adds detector-IRF convolution with the vendored 745 nm table
    (near the MAPI emission wavelength). The dataset's ~30 ns binning
    makes the 4.7 ns-wide IRF numerically almost an identity, so it is
    off by default; the flag exists to exercise the full pipeline on
    real data."""
    from metrotrpl_tpu.config import generate_config_script_file

    args.out = _resolve_out(args)
    names = ["n0", "p0", "mu_n", "mu_p", "ks", "Cn", "Cp", "Sf", "Sb",
             "tauN", "tauP", "eps", "Tm"]
    n_meas = 3
    simPar = {"lengths": [311] * n_meas, "nx": [128] * n_meas,
              "meas_types": ["TRPL"] * n_meas, "num_meas": n_meas}
    param_info = {
        "names": names,
        "unit_conversions": {"n0": 1e-21, "p0": 1e-21, "mu_n": 1e5,
                             "mu_p": 1e5, "ks": 1e12, "Cn": 1e33,
                             "Cp": 1e33, "Sf": 1e-2, "Sb": 1e-2, "Tm": 1},
        "do_log": {n: 1 for n in names},
        "active": {n: (0 if n in ("n0", "eps", "Tm") else 1) for n in names},
        # reference initial guesses (Inputs/mcmc0.txt Param Info section)
        "init_guess": {"n0": 1e8, "p0": 3e15, "mu_n": 20, "mu_p": 20,
                       "ks": 4.8e-11, "Cn": 4.4e-29, "Cp": 4.4e-29,
                       "Sf": 10, "Sb": 10, "tauN": 511, "tauP": 871,
                       "eps": 10, "Tm": 300},
        "prior_dist": {"n0": (0, np.inf), "p0": (1e14, 1e16),
                       "mu_n": (1e0, 1e2), "mu_p": (1e0, 1e2),
                       "ks": (1e-11, 1e-9), "Cn": (1e-29, 1e-27),
                       "Cp": (1e-29, 1e-27), "Sf": (1e-4, 1e4),
                       "Sb": (1e-4, 1e4), "tauN": (1, 1500),
                       "tauP": (1, 3000), "eps": (0, np.inf),
                       "Tm": (0, np.inf)},
        "trial_move": {n: 0.01 for n in names},
    }
    meas_fields = {"time_cutoff": [0, np.inf], "select_obs_sets": None}
    MCMC_fields = {
        "init_cond_path": args.init_cond or os.path.join(
            "Inputs", "real_staub_input.csv"),
        "measurement_path": args.measurement or os.path.join(
            "Inputs", "real_staub_aug_corr_renoised.csv"),
        "output_path": args.output or os.path.join("bay_outputs", "real0"),
        "ini_mode": "density",
        "num_iters": args.num_iters,
        **({"solver": ("sdirk",), "hmax": 48.0, "refactor_every": 4}
           if getattr(args, "fast", False) else {"solver": ("solveivp",)}),
        "model": "std",
        "model_uncertainty": 1,
        "log_y": 1,
        "scale_factor": None,
        "irf_convolution": ([745] * n_meas if getattr(args, "irf", False)
                            else None),
        "parallel_tempering": [1., 2., 4., 8., 16., 32., 64., 128.],
        "temper_freq": 10,
        "hard_bounds": 1,
        "force_min_y": 0,
        "checkpoint_freq": 1000,
        "load_checkpoint": None,
    }
    generate_config_script_file(args.out, simPar, param_info, meas_fields,
                                MCMC_fields, verbose=True)
    print(f"Wrote {args.out}")


def cmd_write_pa_example(args):
    """Generate the 'pa' toy-problem config (reference pa_toy_writer.py:
    1D multi-well potential, tempering ladder [0.05, 0.3, 2])."""
    from metrotrpl_tpu.config import generate_config_script_file

    args.out = _resolve_out(args)
    simPar = {"lengths": [1], "nx": [1], "meas_types": ["pa"],
              "num_meas": 1}
    param_info = {
        "names": ["x0"],
        "unit_conversions": {},
        "do_log": {"x0": 0},
        "active": {"x0": 1},
        "init_guess": {"x0": 0.2},
        "prior_dist": {"x0": (-2, 2)},
        "trial_move": {"x0": 0.2},
    }
    meas_fields = {"time_cutoff": [0, np.inf], "select_obs_sets": None}
    MCMC_fields = {
        "init_cond_path": args.init_cond or "pa_ic.csv",
        "measurement_path": args.measurement or "pa_data.csv",
        "output_path": args.output or os.path.join("bay_outputs", "pa0"),
        "ini_mode": "density",
        "num_iters": args.num_iters,
        "solver": ("solveivp",),
        "model": "pa",
        "model_uncertainty": 1,
        "log_y": 1,
        "hard_bounds": 1,
        "parallel_tempering": [0.05, 0.3, 2.0],
        "temper_freq": 10,
        "checkpoint_freq": 1000,
        "load_checkpoint": None,
    }
    generate_config_script_file(args.out, simPar, param_info, meas_fields,
                                MCMC_fields, verbose=True)
    # minimal companion data files so the config runs out of the box
    base = os.path.dirname(args.out) or "."
    ic = MCMC_fields["init_cond_path"]
    mp = MCMC_fields["measurement_path"]
    for path, content in ((os.path.join(base, os.path.basename(ic)),
                           "0\n"),
                          (os.path.join(base, os.path.basename(mp)),
                           "0,1,1\n")):
        if not os.path.exists(path):
            with open(path, "w") as f:
                f.write(content)
    print(f"Wrote {args.out}")


def cmd_convert_config(args):
    """Convert between the reference text format and the native TOML
    format (direction chosen by the output extension)."""
    import copy

    from metrotrpl_tpu.config import (
        finalize_config,
        generate_config_script_file,
        parse_config,
        write_config_toml,
    )

    # Writers expect RAW (pre-finalize) dicts: finalize subsets the grid
    # under select_obs_sets, which must not be baked into the written file
    # (the written config still references the full measurement CSVs).
    raw = parse_config(args.src)
    finalize_config(*copy.deepcopy(raw))  # validate without mutating
    dst = args.dst
    if dst.endswith(".toml"):
        write_config_toml(dst, *raw)
    else:
        generate_config_script_file(dst, *raw)
        if not dst.endswith(".txt"):
            dst += ".txt"  # the text writer enforces the extension
    print(f"Wrote {dst}")


def main(argv=None):
    p = argparse.ArgumentParser(prog="metrotrpl_tpu",
                                description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = p.add_subparsers(dest="cmd", required=True)

    for name, fn in (("mcmc", cmd_mcmc), ("dense", cmd_dense),
                     ("mle", cmd_mle)):
        sp = sub.add_parser(name)
        sp.add_argument("config",
                        help="MCMC config script path, or a script header "
                             "resolved as {header}{jobid}.txt (reference "
                             "SLURM-array convention)")
        sp.add_argument("--jobid", type=int, default=None,
                        help="defaults to $SLURM_ARRAY_TASK_ID, else 0")
        sp.add_argument("--seed", type=int, default=None)
        sp.add_argument("--verbose", action="store_true")
        sp.add_argument("--irf-dir", default="IRFs")
        if name == "mcmc":
            sp.add_argument(
                "--ensembles", type=int, default=1,
                help="independent MH replicas fused through one compiled "
                     "kernel (TPU aggregate-throughput optimum); each "
                     "gets seed+e and its own CPU{e}-final.pik")
            sp.add_argument(
                "--mesh", default=None, metavar="ExC",
                help="run the multi-chip production driver over an "
                     "(ensembles x chains) device mesh, e.g. --mesh 2x4 "
                     "(needs E*C devices; --ensembles %% E == 0 and "
                     "chain count %% C == 0)")
        if name == "mle":
            sp.add_argument("--maxiter", type=int, default=None)
        sp.set_defaults(fn=fn)

    for name, fn, iters in (
            ("write-example", cmd_write_example, 100),
            ("write-real-example", cmd_write_real_example, 8000),
            ("write-pa-example", cmd_write_pa_example, 5000)):
        sp = sub.add_parser(name)
        sp.add_argument("out",
                        help="config path (*.txt), or a script header "
                             "written as {header}{jobid}.txt")
        sp.add_argument("--jobid", type=int, default=None,
                        help="defaults to $SLURM_ARRAY_TASK_ID, else 0")
        sp.add_argument("--num-iters", type=int, default=iters)
        if name in ("write-example", "write-real-example"):
            sp.add_argument(
                "--fast", action="store_true",
                help="write the TPU-native fast solver config "
                     "(Solver name: sdirk, hmax 48, chord "
                     "refactor_every 4 — the headline-"
                     "benchmark mode) instead of reference solveivp")
        if name == "write-real-example":
            sp.add_argument(
                "--irf", action="store_true",
                help="convolve with the vendored 745 nm detector IRF "
                     "(~identity at this dataset's 30 ns binning; "
                     "exercises the full pipeline)")
        sp.add_argument("--init-cond", default=None)
        sp.add_argument("--measurement", default=None)
        sp.add_argument("--output", default=None)
        sp.set_defaults(fn=fn)

    sp = sub.add_parser(
        "convert-config",
        help="convert between the reference text config format and the "
             "native TOML format (by output extension)")
    sp.add_argument("src")
    sp.add_argument("dst")
    sp.set_defaults(fn=cmd_convert_config)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
