"""External LUT3D generators (reference rtengine/extclut.cc)."""

import os
import sys

import numpy as np


def _write_generator(tmp_path, server=False):
    """A fake LUT generator: writes an identity-ish 2^3 cube whose red
    channel is scaled by the 'gain' parameter."""
    gen = tmp_path / "gen.py"
    gen.write_text("""\
import json, sys
def write_cube(params_json, outname):
    p = json.loads(params_json)
    g = float(p.get("gain", 1.0))
    with open(outname, "w") as f:
        f.write("LUT_3D_SIZE 2\\n")
        for b in (0.0, 1.0):
            for gg in (0.0, 1.0):
                for r in (0.0, 1.0):
                    f.write(f"{r*g} {gg} {b}\\n")

if "--server" in sys.argv:
    while True:
        params = sys.stdin.readline()
        if not params:
            break
        outname = sys.stdin.readline().strip()
        write_cube(params, outname)
        print("Y 0", flush=True)
else:
    write_cube(open(sys.argv[1]).read(), sys.argv[2])
""")
    cmd = f"{sys.executable} {gen}" + (" --server" if server else "")
    cfg = tmp_path / ("srv.json" if server else "once.json")
    cfg.write_text(
        '// comment tolerance\n{"ART-lut3d": {"command": %s,'
        '"server": %s, "params": [["gain", "Gain", 0.0, 2.0, 1.0, 0.1]],'
        '"label": "Fake"}}' % (repr(cmd).replace("'", '"'),
                               "true" if server else "false"))
    return str(cfg)


def test_extclut_oneshot(tmp_path):
    from art_tpu.color.extclut import ExternalLUT3D, get_external_lut

    cfg = _write_generator(tmp_path, server=False)
    ext = ExternalLUT3D(cfg)
    assert ext.ok and not ext.server
    assert ext.default_values() == {"gain": 1.0}
    lut = get_external_lut(cfg, {"gain": 0.5})
    assert lut is not None
    np.testing.assert_allclose(np.asarray(lut)[1, 0, 0][0], 0.5, atol=1e-4)
    # cache hit: same params -> same file
    p1 = ext.generate({"gain": 0.5})
    p2 = ext.generate({"gain": 0.5})
    assert p1 == p2 and os.path.isfile(p1)


def test_extclut_server(tmp_path):
    from art_tpu.color.extclut import ExternalLUT3D

    cfg = _write_generator(tmp_path, server=True)
    ext = ExternalLUT3D(cfg)
    assert ext.ok and ext.server
    out1 = ext.generate({"gain": 2.0})
    out2 = ext.generate({"gain": 0.25})
    assert out1 and out2 and out1 != out2
    ext.close()


def test_filmsim_external_json(tmp_path):
    import jax.numpy as jnp

    from art_tpu.ops import filmsim
    from art_tpu.params import ProcParams

    cfg = _write_generator(tmp_path, server=False)
    pp = ProcParams()
    pp.film_simulation.enabled = True
    pp.film_simulation.clut_filename = cfg
    pp.film_simulation.clut_params = "gain=0.5;"
    planned = filmsim.plan(pp, {"working_profile": "sRGB"})
    assert planned is not None
    static, data = planned
    rgb = jnp.full((3, 16, 128), 65535.0)
    out = np.asarray(filmsim.apply(rgb, data, static))
    # LUTs apply on gamma-encoded sRGB (Hald CLUT semantics): red 1.0 ->
    # 0.5 encoded -> ~0.214 linear
    np.testing.assert_allclose(out[0] / 65535.0, 0.2140, atol=0.01)
    np.testing.assert_allclose(out[1] / 65535.0, 1.0, atol=0.01)
