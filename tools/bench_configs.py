"""Measure all five BASELINE.json benchmark configs on the real chip.

Emits one JSON object (BENCH_CONFIGS.json format) with per-config
results. bench.py stays the driver's single-line gate (the north-star
config); this sibling covers the full config matrix:

  1. headless CLI: decode -> bilinear develop -> sRGB JPEG, end-to-end
  2. AMaZE + raw CA correct + hot/dead + green-eq (24MP, device)
  3. RCD + wavelet NR + NLMeans + impulse (24MP, device)
  4. X-Trans 3-pass + tone-eq + local contrast + dehaze + film-sim LUT
  5. batch queue at reduced scale (64 synthetic raws, decode->device->
     encode wall clock on the available mesh)

Run: python tools/bench_configs.py [--out BENCH_CONFIGS.json]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _fence(out):
    import jax
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * (leaf.ndim - 1) + (slice(0, 2),)]
               if leaf.ndim else leaf)


def _time_device(run, inp, data, n=8):
    import jax
    inp = jax.device_put(inp)
    data = jax.device_put(data)
    _fence(run(inp, data))
    t0 = time.time()
    for _ in range(n):
        out = run(inp, data)
    _fence(out)
    return (time.time() - t0) / n


def _device_config(frame, pp):
    from art_tpu.core.image import pad_to_multiple
    from art_tpu.pipeline.develop import _executor, plan
    from art_tpu.settings import settings

    config, data = plan(frame, pp)
    inp, _ = pad_to_multiple(frame.cfa, settings.pad_multiple)
    return _time_device(_executor(config), inp, data)


def bayer_frame(h=4000, w=6000, seed=0):
    from art_tpu.io.rawfile import synthesize_bayer
    rng = np.random.default_rng(seed)
    rgb = rng.uniform(0.02, 0.95, size=(3, h, w)).astype(np.float32)
    return synthesize_bayer(rgb, pattern="RGGB")


def main():
    from art_tpu.core import compilecache
    compilecache.enable()
    import jax

    import art_tpu
    from art_tpu.params import ProcParams

    art_tpu.init()
    results = {"device": str(jax.devices()[0]).split(":")[0]}
    out_path = sys.argv[sys.argv.index("--out") + 1] \
        if "--out" in sys.argv else "BENCH_CONFIGS.json"

    def _save():
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
        print(json.dumps(results), flush=True)

    # ---- config 1: headless CLI end-to-end (decode -> JPEG) ----
    from art_tpu.io.dngwrite import write_dng
    m = (np.random.default_rng(1).uniform(0.05, 0.9, (4000, 6000))
         * 16000 + 500).astype(np.uint16)
    raw_path = "/tmp/bench_c1.dng"
    write_dng(raw_path, m, black=500, white=16500)
    pp1 = ProcParams()
    pp1.raw.bayer.method = "bilinear"
    # warm (compile), then time end-to-end: load + develop + encode
    from art_tpu.io.imagefile import save_image
    from art_tpu.io.rawfile import load_raw
    from art_tpu.pipeline.develop import process_image

    def run_c1():
        # the real CLI path: output_path triggers the device-side u8+HWC
        # output (74MB over the tunnel instead of 295MB of f32 planes)
        frame = load_raw(raw_path)
        frame.filename = None  # synthetic: skip the metadata harvest
        process_image(frame, pp1, output_path="/tmp/bench_c1.jpg")

    run_c1()
    t0 = time.time()
    n = 5
    for _ in range(n):
        run_c1()
    results["c1_cli_bilinear_jpeg_s"] = round((time.time() - t0) / n, 4)
    _save()

    # ---- config 2: AMaZE + CA + hot/dead + green-eq (device) ----
    frame = bayer_frame()
    pp2 = ProcParams()
    pp2.raw.bayer.method = "amaze"
    pp2.raw.ca_enabled = True
    pp2.raw.ca_autocorrect = True
    pp2.raw.hotdead_enabled = True
    pp2.raw.bayer.green_eq_enabled = True
    pp2.raw.bayer.green_eq = 100.0
    results["c2_amaze_ca_hotdead_greeneq_s"] = round(
        _device_config(frame, pp2), 4)
    _save()

    # ---- config 3: RCD + wavelet NR + NLMeans + impulse (device) ----
    pp3 = ProcParams()
    pp3.raw.bayer.method = "rcd"
    pp3.denoise.enabled = True
    pp3.denoise.luminance = 20.0
    pp3.denoise.chrominance = 20.0
    pp3.denoise.nl_strength = 50
    pp3.impulse_denoise.enabled = True
    results["c3_rcd_wavelet_nlmeans_impulse_s"] = round(
        _device_config(frame, pp3), 4)
    _save()

    # ---- config 4: X-Trans 3-pass + tone-eq + local contrast +
    #      dehaze + film-sim LUT (device) ----
    from art_tpu.io.rawfile import synthesize_xtrans
    rng = np.random.default_rng(2)
    rgbx = rng.uniform(0.02, 0.95, size=(3, 4008, 6000)).astype(np.float32)
    framex = synthesize_xtrans(rgbx)
    # identity-ish 33^3 .cube LUT
    cube = "/tmp/bench_c4.cube"
    if not os.path.exists(cube):
        nlut = 33
        ax = np.linspace(0, 1, nlut)
        with open(cube, "w") as f:
            f.write(f"LUT_3D_SIZE {nlut}\n")
            for b in ax:
                for g in ax:
                    for r in ax:
                        f.write(f"{r**1.05:.6f} {g:.6f} {b**0.95:.6f}\n")
    pp4 = ProcParams()
    pp4.raw.xtrans.method = "3-pass"
    pp4.tone_equalizer.enabled = True
    pp4.tone_equalizer.band0 = -20
    pp4.tone_equalizer.band1 = -10
    pp4.tone_equalizer.band3 = 10
    pp4.tone_equalizer.band4 = 20
    pp4.dehaze.enabled = True
    pp4.film_simulation.enabled = True
    pp4.film_simulation.clut_filename = cube
    pp4.apply_arp_text("[Local Contrast]\nEnabled=true\nContrast=30\n")
    results["c4_xtrans_toneeq_lc_dehaze_filmsim_s"] = round(
        _device_config(framex, pp4), 4)
    _save()

    # ---- flagship end-to-end decomposition: the host ceiling around
    #      the device step (decode / H2D / device / D2H / encode) ----
    ppf = ProcParams()
    arp = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "art_tpu", "data", "profiles",
        "Standard Film Curve.arp")
    ppf.apply_arp_text(open(arp).read())
    ppf.raw.bayer.method = "amaze"
    ppf.denoise.enabled = True
    ppf.denoise.luminance = 20.0
    ppf.denoise.chrominance = 20.0
    from art_tpu.core.image import pad_to_multiple
    from art_tpu.pipeline.develop import _executor, plan
    from art_tpu.settings import settings as _settings

    t0 = time.time()
    fframe = load_raw(raw_path)
    t_decode = time.time() - t0
    fconfig, fdata = plan(fframe, ppf, out_u8=True)
    finp, _ = pad_to_multiple(fframe.cfa, _settings.pad_multiple)
    frun = _executor(fconfig)
    fdata_dev = jax.device_put(fdata)
    out = frun(jax.device_put(finp), fdata_dev)  # compile warm
    np.asarray(out[0, :2])
    t0 = time.time()
    finp_dev = jax.device_put(finp)
    jax.block_until_ready(finp_dev)
    t_h2d = time.time() - t0
    t0 = time.time()
    for _ in range(5):
        out = frun(finp_dev, fdata_dev)
    np.asarray(out[0, :2])
    t_dev = (time.time() - t0) / 5
    t0 = time.time()
    host_out = np.asarray(out)
    t_d2h = time.time() - t0
    t0 = time.time()
    save_image("/tmp/bench_flag.jpg", host_out)
    t_encode = time.time() - t0
    results["flagship_e2e_s"] = {
        "decode": round(t_decode, 3), "h2d": round(t_h2d, 3),
        "device": round(t_dev, 3), "d2h": round(t_d2h, 3),
        "encode": round(t_encode, 3),
    }
    results["flagship_e2e_over_device"] = round(
        (t_decode + t_h2d + t_dev + t_d2h + t_encode) / t_dev, 2)
    _save()

    # ---- config 5: batch queue, 64 x 24MP (end-to-end) ----
    from art_tpu.parallel.queue import process_batch
    njobs = int(os.environ.get("BENCH_C5_JOBS", "64"))
    qh, qw = int(os.environ.get("BENCH_C5_H", "4000")), \
        int(os.environ.get("BENCH_C5_W", "6000"))
    mq = (np.random.default_rng(3).uniform(0.05, 0.9, (qh, qw))
          * 16000 + 500).astype(np.uint16)
    jobs = []
    for i in range(njobs):
        p = f"/tmp/bench_c5_{i}.dng"
        if not os.path.exists(p):
            if i == 0:
                write_dng(p, mq, black=500, white=16500)
            else:  # identical bytes: hardlink instead of re-encoding
                try:
                    os.link("/tmp/bench_c5_0.dng", p)
                except OSError:
                    write_dng(p, mq, black=500, white=16500)
        pp = ProcParams()
        pp.raw.bayer.method = "amaze"
        pp.denoise.enabled = True
        pp.denoise.luminance = 20.0
        jobs.append((p, pp, f"/tmp/bench_c5_out_{i}.jpg"))
    stats = {}
    process_batch(jobs[:2], stats=stats)  # warm compile
    t0 = time.time()
    oks = process_batch(jobs, stats=stats)
    wall = time.time() - t0
    results["c5_queue_jobs"] = njobs
    results["c5_queue_mp"] = round(qh * qw / 1e6, 1)
    results["c5_queue_imgs_per_s"] = round(njobs / wall, 3)
    results["c5_queue_ok"] = int(sum(oks))
    results["c5_peak_in_flight"] = stats.get("peak_in_flight")
    results["c5_stage_seconds"] = stats.get("stage_seconds")

    _save()


if __name__ == "__main__":
    main()
