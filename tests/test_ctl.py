"""CTL script interpreter (clutstore.cc ART_USE_CTL role)."""

import numpy as np
import jax.numpy as jnp
import pytest

from art_tpu.color import ctl


SIMPLE = """
// @ART-label: "Test gain"
// @ART-param: ["gain", "Gain", 0.0, 4.0, 2.0, 0.1]
// @ART-param: ["enable", "Enable", true]
void ART_main(varying float r, varying float g, varying float b,
              output varying float ro, output varying float go,
              output varying float bo,
              float gain, bool enable)
{
    if (enable) {
        ro = r * gain;
        go = g * gain;
        bo = b * gain;
    } else {
        ro = r;
        go = g;
        bo = b;
    }
}
"""


def _script(tmp_path, text, name="t.ctl"):
    p = tmp_path / name
    p.write_text(text)
    return ctl.load_ctl(str(p))


def test_simple_gain(tmp_path):
    s = _script(tmp_path, SIMPLE)
    assert s.label == "Test gain"
    assert [p.name for p in s.params] == ["gain", "enable"]
    assert s.params[0].default == 2.0
    r = jnp.asarray([0.1, 0.5])
    ro, go, bo = s(r, r, r)
    assert np.allclose(np.asarray(ro), [0.2, 1.0])
    ro, _, _ = s(r, r, r, {"gain": 3.0})
    assert np.allclose(np.asarray(ro), [0.3, 1.5])
    ro, _, _ = s(r, r, r, {"gain": 3.0, "enable": 0.0})
    assert np.allclose(np.asarray(ro), [0.1, 0.5])


FUNCS = """
const float M[3][3] = {{0.5, 0, 0}, {0, 2.0, 0}, {0, 0, 1.0}};
const float MI[3][3] = invert_f33(M);

float saturate(float x)
{
    if (x < 0.0) { return 0.0; }
    if (x > 1.0) { return 1.0; }
    return x;
}

void scale3(float v[3], float f, output float out[3])
{
    for (int i = 0; i < 3; i = i+1) {
        out[i] = v[i] * f;
    }
}

void ART_main(varying float r, varying float g, varying float b,
              output varying float ro, output varying float go,
              output varying float bo)
{
    float rgb[3] = {r, g, b};
    float t[3] = mult_f3_f33(rgb, M);
    t = mult_f3_f33(t, MI);
    float u[3];
    scale3(t, 2.0, u);
    ro = saturate(u[0]);
    go = saturate(u[1]);
    bo = saturate(u[2]);
}
"""


def test_functions_matrices_masked_return(tmp_path):
    """User functions, output-array params, const matrix inverse at
    load, varying if/return via path masks."""
    s = _script(tmp_path, FUNCS)
    r = jnp.asarray([-0.5, 0.2, 0.8])
    ro, go, bo = s(r, r, r)
    # M @ MI = I, then x2, then clamp [0,1]
    assert np.allclose(np.asarray(ro), [0.0, 0.4, 1.0], atol=1e-6)
    assert np.allclose(np.asarray(go), [0.0, 0.4, 1.0], atol=1e-6)


LOOPS = """
void ART_main(varying float r, varying float g, varying float b,
              output varying float ro, output varying float go,
              output varying float bo)
{
    float acc = 0.0;
    for (int i = 1; i <= 4; i = i+1) {
        acc = acc + i;
    }
    // acc == 10
    int n = 0;
    while (n < 3) { n = n + 1; }
    ro = r + acc * 0.01;
    go = g + n * 0.01;
    bo = b > 0.5 ? b : b * 0.5;
}
"""


def test_loops_and_ternary(tmp_path):
    s = _script(tmp_path, LOOPS)
    v = jnp.asarray([0.2, 0.8])
    ro, go, bo = s(v, v, v)
    assert np.allclose(np.asarray(ro), [0.3, 0.9], atol=1e-6)
    assert np.allclose(np.asarray(go), [0.23, 0.83], atol=1e-6)
    assert np.allclose(np.asarray(bo), [0.1, 0.8], atol=1e-6)


def test_art_param_forms(tmp_path):
    text = """
// @ART-param: ["f", "Float", -1.0, 1.0, 0.25, 0.05]
// @ART-param: ["i", "Int", -10, 10]
// @ART-param: ["flag", "Bool", true]
// @ART-param: ["choice", "Choice", ["A", "B", "C"], 1]
// @ART-colorspace: "acescg"
// @ART-lut: 32
void ART_main(varying float r, varying float g, varying float b,
              output varying float ro, output varying float go,
              output varying float bo,
              float f, int i, bool flag, int choice)
{
    ro = r; go = g; bo = b;
}
"""
    s = _script(tmp_path, text)
    assert s.colorspace == "ACESp1"
    assert s.lut_dim == 32
    by = {p.name: p for p in s.params}
    assert by["f"].type == "float" and by["f"].default == 0.25
    assert by["i"].type == "int"
    assert by["flag"].type == "bool" and by["flag"].default is True
    assert by["choice"].type == "choice" and by["choice"].choices == \
        ["A", "B", "C"] and by["choice"].default == 1


def test_shaper_roundtrip():
    x = jnp.asarray(np.linspace(0.0, 1.0, 64), jnp.float32)
    lin = ctl.ctl_shaper(x, inv=True)
    back = ctl.ctl_shaper(lin)
    assert np.allclose(np.asarray(back), np.asarray(x), atol=2e-3)


def test_bake_lut_matches_direct(tmp_path):
    s = _script(tmp_path, SIMPLE)
    table = ctl.bake_lut(s, dim=17)
    assert table.shape == (17, 17, 17, 3)
    # LUT holds ART_main outputs at shaper-inverse grid coords
    grid = np.linspace(0.0, 1.0, 17, dtype=np.float32)
    lin = np.asarray(ctl.ctl_shaper(jnp.asarray(grid), inv=True))
    assert np.allclose(table[:, 0, 0, 0], lin * 2.0, rtol=1e-4, atol=1e-5)


def test_reference_sigmoid_script_runs():
    """The bundled ART sigmoid script (full darktable port: const matrix
    globals, nested functions, output params, varying isnan guard)."""
    s = ctl.load_ctl("/root/reference/rtdata/luts/sigmoid.ctl")
    assert s.colorspace == "Rec2020"
    r = jnp.asarray(np.linspace(0.0, 4.0, 33), jnp.float32)
    ro, go, bo = s(r, r * 0.5, r * 0.25)
    ro = np.asarray(ro)
    assert np.all(np.isfinite(ro))
    assert np.all(np.diff(ro) > -1e-5)  # monotone tone curve
    assert ro[-1] <= 1.5 and ro[0] >= 0.0


def test_filmsim_ctl_end_to_end(tmp_path):
    from art_tpu.io.rawfile import synthesize_bayer
    from art_tpu.params import ProcParams
    from art_tpu.pipeline.develop import process_image

    p = tmp_path / "gain.ctl"
    p.write_text(SIMPLE)
    rng = np.random.default_rng(0)
    rgb = rng.uniform(0.1, 0.4, size=(3, 64, 64)).astype(np.float32)
    frame = synthesize_bayer(rgb)
    pp = ProcParams()
    pp.film_simulation.enabled = True
    pp.film_simulation.clut_filename = str(p)
    pp.film_simulation.clut_params = "gain=1.5"
    out = np.asarray(process_image(frame, pp))
    base = np.asarray(process_image(frame, ProcParams()))
    # gain 1.5 in scene-linear -> visibly brighter output
    assert out.mean() > base.mean() * 1.05
