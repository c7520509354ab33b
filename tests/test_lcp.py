"""Adobe LCP parsing + pipeline integration (reference rtengine/lcp.cc)."""

import textwrap

import numpy as np

from art_tpu.io.rawfile import synthesize_bayer
from art_tpu.lens.lcp import parse_lcp
from art_tpu.params import ProcParams
from art_tpu.pipeline.develop import develop, plan

_LCP = textwrap.dedent("""\
<?xml version="1.0" encoding="UTF-8"?>
<x:xmpmeta xmlns:x="adobe:ns:meta/">
 <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">
  <rdf:Description xmlns:stCamera="http://ns.adobe.com/photoshop/1.0/camera-profile"
    stCamera:Make="SynthCo" stCamera:Model="Prime 35"
    stCamera:FocalLength="35.0" stCamera:ApertureValue="2.8">
   <stCamera:PerspectiveModel>
    <rdf:Description stCamera:FocalLengthX="1.0" stCamera:FocalLengthY="1.0"
      stCamera:ImageXCenter="0.5" stCamera:ImageYCenter="0.5"
      stCamera:RadialDistortParam1="-0.05"
      stCamera:RadialDistortParam2="0.01"/>
   </stCamera:PerspectiveModel>
   <stCamera:VignetteModel>
    <rdf:Description stCamera:FocalLengthX="1.0" stCamera:FocalLengthY="1.0"
      stCamera:VignetteModelParam1="-0.4"
      stCamera:VignetteModelParam2="0.1"/>
   </stCamera:VignetteModel>
  </rdf:Description>
 </rdf:RDF>
</x:xmpmeta>
""")


def _write_lcp(tmp_path):
    p = str(tmp_path / "synth.lcp")
    with open(p, "w") as f:
        f.write(_LCP)
    return p


def test_lcp_parse(tmp_path):
    prof = parse_lcp(_write_lcp(tmp_path))
    assert prof is not None and len(prof.frames) == 1
    m = prof.distortion(35.0)
    assert m.param[0] == -0.05 and m.param[1] == 0.01
    vm = prof.vignette(35.0, 2.8)
    # merge :109: vign series head = -param[0]
    assert abs(vm.vign_param()[0] - 0.4) < 1e-6


def test_lcp_develop_distortion_and_vignette(tmp_path):
    rng = np.random.default_rng(1)
    rgb = rng.uniform(0.2, 0.8, size=(3, 96, 128)).astype(np.float32)
    fr = synthesize_bayer(rgb, cam_mul=(1.0, 1.0, 1.0))
    fr.exif["focal_length"] = 35.0
    fr.exif["f_number"] = 2.8
    pp = ProcParams()
    pp.raw.bayer.method = "bilinear"
    pp.lens_prof.method = "lcp"
    pp.lens_prof.lcp_file = _write_lcp(tmp_path)
    config, data = plan(fr, pp)
    assert config.transform
    assert "lcp_dist" in data["transform"]
    assert "lcp_vign" in data
    out = develop(fr, pp)
    assert np.isfinite(out).all()

    pp2 = ProcParams()
    pp2.raw.bayer.method = "bilinear"
    out2 = develop(fr, pp2)
    # the falloff model brightens corners relative to the center
    corner = out[:, 2:10, 2:10].mean() / out2[:, 2:10, 2:10].mean()
    center = out[:, 44:52, 60:68].mean() / out2[:, 44:52, 60:68].mean()
    assert corner > center * 1.02
