"""Command-line renderer — the framework's ``mitsuba`` binary equivalent.

Reference: mitsuba/src/mitsuba/mitsuba.cpp (CLI arg parsing :55-86, scene
load :354, render job :390). Usage:

    python -m sdmm_tpu render scene.xml -o out.exr -D key=val --spp 64
    python -m sdmm_tpu render scene.xml --integrator sdmm --spp 1024

Integrators: ``gt``/``volpath`` (NEE path tracing), ``path`` (no NEE),
``sdmm`` (guided training render). Stats are written next to the output as
stats.json (schema: reference volpath_sdmm.cpp:474-490).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _parse_defines(pairs):
    out = {}
    for p in pairs or []:
        k, _, v = p.partition("=")
        out[k] = v
    return out


def cmd_render(args):
    import numpy as np

    from .utils.cache import enable as enable_cache

    enable_cache()
    from .scene.xml_loader import load_scene
    from .utils.exr import write_exr

    overrides = _parse_defines(args.define)
    overrides.setdefault("samplesPerIteration", str(args.samples_per_iteration))
    if args.integrator:
        overrides["integrator"] = args.integrator
    builder = load_scene(args.scene, overrides)
    scene, cfg = builder.build()
    if args.width:
        cfg.width = args.width
    if args.height:
        cfg.height = args.height
    if args.max_depth:
        cfg.max_depth = args.max_depth
        cfg.rr_depth = args.max_depth
    spp = args.spp or builder.sample_count
    integrator = args.integrator or builder.integrator.get("type", "volpath")
    out = args.output or os.path.splitext(args.scene)[0] + ".exr"
    out_dir = os.path.dirname(os.path.abspath(out))
    os.makedirs(out_dir, exist_ok=True)

    t0 = time.time()
    if integrator == "ppg":
        from .guiding.ppg import PPGConfig, PPGTrainer

        trainer = PPGTrainer(scene, cfg, PPGConfig(seed=builder.seed))
        image, iters = trainer.run(total_spp=spp, verbose=args.verbose)
        with open(os.path.join(out_dir, "stats.json"), "w") as f:
            json.dump(trainer.stats, f, indent=2)
    elif integrator == "sdmm":
        from .guiding import io as gio
        from .guiding.trainer import SDMMTrainer, TrainerConfig

        tc = TrainerConfig(
            samples_per_iteration=int(overrides.get("samplesPerIteration", 4)),
            seed=builder.seed,
            reservoir_capacity=int(overrides.get("reservoirCapacity", 0)),
            optimize_async=overrides.get("optimizeAsync", "false") == "true",
        )
        trainer = SDMMTrainer(scene, cfg, tc)
        prev_iters = None
        if getattr(args, "resume", None):
            prev_iters = trainer.restore(args.resume)
        image, iters = trainer.run(total_spp=spp, verbose=args.verbose,
                                   iters=prev_iters)
        if getattr(args, "checkpoint", None):
            gio.save_full_checkpoint(args.checkpoint, trainer, iters)
        with open(os.path.join(out_dir, "stats.json"), "w") as f:
            json.dump(trainer.stats, f, indent=2)
        ckpt_dir = os.path.join(out_dir, "checkpoints")
        os.makedirs(ckpt_dir, exist_ok=True)
        gio.save_checkpoint(
            os.path.join(ckpt_dir, f"model_{trainer.iteration:05d}.asdmm"), trainer
        )
        if args.dump_iterations:
            for i, it in enumerate(iters):
                n = np.maximum(it["weight"], 1.0)[:, None]
                write_exr(
                    os.path.join(out_dir, f"iteration{i:05d}.exr"),
                    (it["image"] / n).reshape(cfg.height, cfg.width, 3),
                )
                write_exr(
                    os.path.join(out_dir, f"iteration_sqr{i:05d}.exr"),
                    (it["sqr"] / n).reshape(cfg.height, cfg.width, 3),
                )
    elif integrator == "motion":
        from .render import classic
        from .render.renderer import render as render_fn

        props = dict(builder.integrator)
        props.update(overrides)
        tm = float(props.get("time", 1.0))
        trace_fn = lambda scene, key, ro, rd: classic.trace_motion(  # noqa: E731
            scene, key, ro, rd, width=cfg.width, height=cfg.height,
            time=tm, fov_axis=cfg.fov_axis,
        )
        res = render_fn(scene, cfg, spp=spp, seed=builder.seed,
                        trace_fn=trace_fn)
        image = res["image"]
        stats = {"integrator": integrator, "spp": spp,
                 "seconds": time.time() - t0,
                 "mean": float(np.asarray(image).mean())}
        with open(os.path.join(out_dir, "stats.json"), "w") as f:
            json.dump(stats, f, indent=2)
    elif integrator in ("direct", "ao", "field"):
        from .render import classic
        from .render.renderer import render as render_fn

        props = dict(builder.integrator)
        props.update(overrides)
        if integrator == "direct":
            es = int(props.get("emitterSamples", props.get("shadingSamples", 1)))
            bs = int(props.get("bsdfSamples", props.get("shadingSamples", 1)))
            trace_fn = lambda scene, key, ro, rd: classic.trace_direct(  # noqa: E731
                scene, key, ro, rd, emitter_samples=es, bsdf_samples=bs,
                bsdf_types=cfg.bsdf_types or None, has_bump=cfg.has_bump,
            )
        elif integrator == "ao":
            rl = float(props.get("rayLength", -1.0))
            ss = int(props.get("shadingSamples", 1))
            trace_fn = lambda scene, key, ro, rd: classic.trace_ao(  # noqa: E731
                scene, key, ro, rd, ray_length=rl, shading_samples=ss,
            )
        else:
            fld = props.get("field", "shNormal")
            trace_fn = lambda scene, key, ro, rd: classic.trace_field(  # noqa: E731
                scene, key, ro, rd, field=fld, bsdf_types=cfg.bsdf_types or None,
            )
        res = render_fn(scene, cfg, spp=spp, seed=builder.seed, trace_fn=trace_fn,
                        sampler=args.sampler or builder.sampler,
                        rfilter=args.rfilter or builder.rfilter)
        image = res["image"]
        stats = {"integrator": integrator, "spp": spp,
                 "seconds": time.time() - t0,
                 "mean": float(np.asarray(image).mean())}
        with open(os.path.join(out_dir, "stats.json"), "w") as f:
            json.dump(stats, f, indent=2)
    elif integrator == "irrcache":
        from .render.irrcache import render_irrcache

        props = dict(builder.integrator)
        props.update(overrides)
        res = render_irrcache(
            scene, cfg, spp=spp, seed=builder.seed,
            gather_res=int(props.get("resolution", 14)),
            kappa=float(props.get("quality", 1.0)),
            indirect_only=bool(props.get("indirectOnly", False)),
        )
        image = res["image"]
        stats = {"integrator": integrator, "spp": spp,
                 "seconds": time.time() - t0,
                 "mean": float(np.asarray(image).mean())}
        with open(os.path.join(out_dir, "stats.json"), "w") as f:
            json.dump(stats, f, indent=2)
    elif integrator == "ptracer":
        from .render.ptracer import render_ptracer

        res = render_ptracer(scene, cfg, spp=spp, seed=builder.seed)
        image = res["image"]
        stats = {"integrator": integrator, "spp": spp,
                 "seconds": time.time() - t0, "n_paths": res["n_paths"],
                 "mean": float(np.asarray(image).mean())}
        with open(os.path.join(out_dir, "stats.json"), "w") as f:
            json.dump(stats, f, indent=2)
    elif integrator == "adaptive":
        from .render.classic import render_adaptive

        props = dict(builder.integrator)
        props.update(overrides)
        res = render_adaptive(
            scene, cfg, max_spp=spp, seed=builder.seed,
            max_error=float(props.get("maxError", 0.05)),
        )
        image = res["image"]
        stats = {"integrator": integrator, "spp": spp,
                 "seconds": time.time() - t0,
                 "mean_spp": float(res["spp_map"].mean()),
                 "mean": float(np.asarray(image).mean())}
        with open(os.path.join(out_dir, "stats.json"), "w") as f:
            json.dump(stats, f, indent=2)
    elif integrator == "multichannel":
        from .render.classic import FIELDS, render_multichannel

        props = dict(builder.integrator)
        props.update(overrides)
        fields = tuple(
            f for f in str(props.get(
                "fields", "position,shNormal,albedo,distance"
            )).split(",") if f in FIELDS
        )
        chans = render_multichannel(scene, cfg, fields=fields, spp=spp,
                                    seed=builder.seed)
        base, ext = os.path.splitext(out)
        for name, chan in chans.items():
            write_exr(f"{base}_{name}{ext or '.exr'}", np.asarray(chan))
        image = chans[fields[0]]
        stats = {"integrator": integrator, "spp": spp,
                 "fields": list(fields), "seconds": time.time() - t0}
        with open(os.path.join(out_dir, "stats.json"), "w") as f:
            json.dump(stats, f, indent=2)
    elif integrator == "bdpt":
        from .render.bdpt import render_bdpt

        res = render_bdpt(scene, cfg, spp=spp, seed=builder.seed)
        image = res["image"]
        stats = {"integrator": integrator, "spp": spp,
                 "seconds": time.time() - t0,
                 "mean": float(np.asarray(image).mean())}
        with open(os.path.join(out_dir, "stats.json"), "w") as f:
            json.dump(stats, f, indent=2)
    elif integrator in ("pssmlt", "mlt", "erpt"):
        from .render import pssmlt as psm

        props = dict(builder.integrator)
        props.update(overrides)
        if integrator == "erpt":
            res = psm.render_erpt(
                scene, cfg, spp=spp, seed=builder.seed,
                chain_length=int(props.get("chainLength", 32)),
            )
        elif integrator == "mlt":
            # Path-space Veach MLT: explicit-path lens/caustic
            # perturbations (render/mlt.py; reference mlt.cpp). Scenes
            # whose transport is environment/sun-sky only have no
            # area-emitter bootstrap paths (b == 0 -> black image); fall
            # back to pssmlt, whose primary-sample-space mutations handle
            # env transport (reference handles env via the bidirectional
            # mutation's path sampling, mlt.cpp).
            from .render.mlt import render_mlt

            has_area = np.asarray(scene.em_tri_idx).size > 0
            res = render_mlt(scene, cfg, spp=spp, seed=builder.seed) \
                if has_area else None
            if res is None or float(res.get("b", 0.0)) <= 0.0:
                print("mlt: no area-emitter bootstrap paths (b == 0); "
                      "falling back to pssmlt for env transport")
                res = psm.render_pssmlt(
                    scene, cfg, spp=spp, seed=builder.seed,
                    p_large=float(props.get("pLarge", 0.3)),
                    mutations="kelemen",
                )
        else:
            res = psm.render_pssmlt(
                scene, cfg, spp=spp, seed=builder.seed,
                p_large=float(props.get("pLarge", 0.3)),
                mutations="kelemen",
            )
        image = res["image"]
        stats = {"integrator": integrator, "spp": spp,
                 "seconds": time.time() - t0, "b": res["b"],
                 "mean": float(np.asarray(image).mean())}
        with open(os.path.join(out_dir, "stats.json"), "w") as f:
            json.dump(stats, f, indent=2)
    elif integrator in ("photonmapper", "ppm", "sppm"):
        from .render import photonmap as pmap

        props = dict(builder.integrator)
        props.update(overrides)
        if integrator == "photonmapper":
            res = pmap.render_photonmap(
                scene, cfg, spp=spp, seed=builder.seed,
                n_photon_paths=int(props.get("globalPhotons", 1 << 17)),
            )
        else:
            # ppm and sppm share the progressive driver (sppm additionally
            # re-jitters camera samples, which the driver always does).
            res = pmap.render_sppm(
                scene, cfg, seed=builder.seed,
                iterations=int(props.get("maxPasses", max(spp // 4, 4))),
                photon_paths_per_iter=int(props.get("photonCount", 1 << 16)),
                alpha=float(props.get("alpha", 0.7)),
            )
        image = res["image"]
        stats = {"integrator": integrator, "spp": spp,
                 "seconds": time.time() - t0,
                 "mean": float(np.asarray(image).mean())}
        with open(os.path.join(out_dir, "stats.json"), "w") as f:
            json.dump(stats, f, indent=2)
    elif integrator == "vpl":
        from .render.ptracer import render_vpl

        props = dict(builder.integrator)
        props.update(overrides)
        res = render_vpl(
            scene, cfg, spp=spp, seed=builder.seed,
            n_light_paths=int(props.get("lightPaths", 32)),
            vpl_depth=int(props.get("maxDepth", 4)),
        )
        image = res["image"]
        stats = {"integrator": integrator, "spp": spp,
                 "seconds": time.time() - t0,
                 "mean": float(np.asarray(image).mean())}
        with open(os.path.join(out_dir, "stats.json"), "w") as f:
            json.dump(stats, f, indent=2)
    else:
        nee = integrator in ("gt", "volpath")
        sampler = args.sampler or builder.sampler
        rfilter = args.rfilter or builder.rfilter
        if not cfg.has_medium and sampler == "independent" and rfilter == "box":
            # Fast path: regenerating wavefront pool (render/wavefront.py).
            from .render.wavefront import render_wavefront

            res = render_wavefront(scene, cfg, spp=spp, seed=builder.seed, nee=nee)
        else:
            from .render.renderer import render as render_fn

            res = render_fn(
                scene, cfg, spp=spp, seed=builder.seed, nee=nee,
                sampler=sampler, rfilter=rfilter,
            )
        image = res["image"]
        stats = {
            "integrator": integrator,
            "spp": spp,
            "seconds": time.time() - t0,
            "mean": float(np.asarray(image).mean()),
        }
        with open(os.path.join(out_dir, "stats.json"), "w") as f:
            json.dump(stats, f, indent=2)

    if out.endswith(".npy"):
        # mfilm/cnpy equivalent: raw float film as a numpy array
        # (reference: src/films/mfilm.cpp, src/films/cnpy.cpp).
        np.save(out, np.asarray(image))
    else:
        write_exr(out, np.asarray(image))
    if args.npy:
        np.save(args.npy, np.asarray(image))
    dt = time.time() - t0
    print(f"Rendered {args.scene} [{integrator}] {cfg.width}x{cfg.height} @ {spp} spp "
          f"in {dt:.1f}s -> {out}")


def cmd_compare(args):
    from .utils.exr import read_exr
    from .utils.metrics import all_metrics

    img = read_exr(args.image)
    ref = read_exr(args.reference)
    m = all_metrics(img, ref)
    print(json.dumps(m, indent=2))


def cmd_import(args):
    from .scene.collada import import_collada

    n = import_collada(args.dae, args.output)
    print(f"Imported {n} meshes from {args.dae} -> {args.output}")
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser(prog="sdmm_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("render", help="render a Mitsuba-0.6 XML scene")
    r.add_argument("scene")
    r.add_argument("-o", "--output")
    r.add_argument("-D", "--define", action="append", metavar="key=val",
                   help="scene variable override (reference: mitsuba -D)")
    r.add_argument("--integrator",
                   choices=["gt", "volpath", "path", "sdmm", "ppg",
                            "direct", "ao", "field", "ptracer", "vpl",
                            "photonmapper", "ppm", "sppm",
                            "pssmlt", "mlt", "erpt", "bdpt",
                            "adaptive", "multichannel", "irrcache", "motion"])
    r.add_argument("--resume", help="resume a training render from a "
                   "full checkpoint (.npz; sdmm integrator)")
    r.add_argument("--checkpoint", help="write a full resume checkpoint "
                   "(.npz) at the end of the render")
    r.add_argument("--spp", type=int)
    r.add_argument("--samples-per-iteration", type=int, default=4)
    r.add_argument("--width", type=int)
    r.add_argument("--height", type=int)
    r.add_argument("--max-depth", type=int)
    r.add_argument("--dump-iterations", action="store_true")
    r.add_argument("--sampler",
                   choices=["independent", "stratified", "halton", "sobol"])
    r.add_argument("--rfilter",
                   choices=["box", "tent", "gaussian", "mitchell",
                            "catmullrom", "lanczos"])
    r.add_argument("--npy", help="also save the film as a .npy array (mfilm)")
    r.add_argument("-v", "--verbose", action="store_true")
    r.set_defaults(fn=cmd_render)

    c = sub.add_parser("compare", help="image metrics vs a reference EXR")
    c.add_argument("image")
    c.add_argument("reference")
    c.set_defaults(fn=cmd_compare)

    i = sub.add_parser(
        "import",
        help="convert a COLLADA .dae scene to scene XML + OBJ meshes "
             "(reference: mtsimport, src/converter/)",
    )
    i.add_argument("dae")
    i.add_argument("-o", "--output", required=True, help="output scene .xml")
    i.set_defaults(fn=cmd_import)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
