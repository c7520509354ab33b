"""Masked color correction tests (reference ipcolorcorrection.cc)."""
import numpy as np
from art_tpu.io.rawfile import synthesize_bayer
from art_tpu.params import ProcParams
from art_tpu.pipeline import develop


def test_colorcorrection_modes():

    frame = synthesize_bayer(np.broadcast_to(np.array([0.5,0.35,0.3])[:,None,None],(3,32,32)).copy())
    # region 1: global slope boost in RGB mode
    arp = """[ColorCorrection]
    Enabled=true
    Mode_1=RGB
    SlopeR_1=1.3
    SlopeG_1=1.0
    SlopeB_1=1.0
    OffsetR_1=0
    PowerR_1=1
    """
    pp = ProcParams().apply_arp_text(arp)
    out = develop(frame, pp)
    base = develop(frame, ProcParams())
    c = out[:,8:-8,8:-8].mean(axis=(1,2)); c0 = base[:,8:-8,8:-8].mean(axis=(1,2))
    _ = ("RGB slope boost:", c, "vs", c0)
    assert c[0] > c0[0] + 0.01, "red slope should boost red"

    # region with Jzazbz saturation
    arp2 = """[ColorCorrection]
    Enabled=true
    Mode_1=Jzazbz
    InSaturation_1=60
    """
    pp2 = ProcParams().apply_arp_text(arp2)
    out2 = develop(frame, pp2)
    c2 = out2[:,8:-8,8:-8].mean(axis=(1,2))
    _ = ("Jz sat:", c2)
    assert (c2[0]-c2[2]) > (c0[0]-c0[2]) + 0.005

    # masked: parametric lightness mask limiting to bright... use hue mask for red
    arp3 = """[ColorCorrection]
    Enabled=true
    Mode_1=YUV
    Slope_1=1.5
    ParametricMaskEnabled_1=true
    LightnessMask_1=1;0;0;0.35;0.35;1;1;0.35;0.35
    """
    pp3 = ProcParams().apply_arp_text(arp3)
    out3 = develop(frame, pp3)
    _ = ("masked YUV slope:", out3[:,8:-8,8:-8].mean())
    pass

