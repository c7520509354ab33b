"""The develop pipeline: plan on host, execute as one jitted program.

Reference: the batch/CLI pipeline ``ImageProcessor`` (simpleprocess.cc:43-575)
— stage_init (decode/preprocess/demosaic/WB) -> stage_denoise ->
stage_transform -> stage_finish (op chain + output transform). Here the
host planner (`plan`) folds ProcParams into (PipelineConfig, data pytree)
and `develop` runs the whole chain on device under jit; the jit cache is
keyed by the config (ARCHITECTURE.md).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from art_tpu import ops as ops_pkg
from art_tpu.color import colorspaces as cs
from art_tpu.core.image import MAXVAL, pad_to_multiple
from art_tpu.raw import preprocess as rawpre
from art_tpu.raw import wb as wbmod
from art_tpu.settings import settings


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Hashable static pipeline description (the jit cache key)."""

    pattern: str | None  # Bayer pattern or None
    xtrans: tuple | None
    is_raw: bool
    demosaic_method: str
    do_clip: bool
    working_profile: str
    out_trc: tuple
    shape: tuple  # padded (H, W)
    orig_shape: tuple  # true (H, W)
    # ordered tuple of (op_name, static_part, stage) for enabled ops;
    # stage 0 runs before crop, stages 1-3 after (improcfun.cc:575-639)
    steps: tuple = ()
    # True = no coarse/transform/crop: stages 1-3 run on the padded planes
    # (lane-aligned width — unaligned widths cost 3-5x on transcendentals)
    # and the slice to true dims happens after the output transform
    late_crop: bool = False
    crop: tuple | None = None  # (y0, x0, h, w) in true coords
    resize_to: tuple | None = None  # (out_h, out_w)
    # fast-export early resize (sh, sw, th, tw): slice to sensor dims then
    # Lanczos to (th, tw) right after the raw stage (simpleprocess.cc:492)
    early_resize: tuple | None = None
    prsharp: tuple | None = None  # post-resize sharpening static
    coarse: tuple = (0, False, False)  # rotate90 k, hflip, vflip
    transform: bool = False
    linedn: tuple = (0.0, 3)
    ca_mode: tuple | None = None
    hotdead: tuple | None = None  # (find_hot, find_dead, thresh)
    badpix_file: bool = False
    green_eq: float = 0.0
    hl_mode: str = "Off"
    pdaf: bool = False
    # method-specific demosaic kwargs (hashable tuple of pairs):
    # dual_contrast/dual_auto for the dual methods, iterations for lmmse
    dem_kwargs: tuple = ()
    # DCP input profile static part (has_hsm, dims, srgb_enc, has_tc, bl)
    dcp: tuple | None = None
    # camera input .icc profile: shaper TRC applied before the matrix
    icc_input_trc: tuple | None = None
    pixelshift: bool = False  # combine 4 shifted frames instead of demosaic
    darkframe: bool = False
    flatfield: tuple | None = None  # (blur_type, radius)
    gainmap: bool = False
    # emit uint8 planes from the device program (8-bit JPEG outputs):
    # the host-side float->u8 conversion costs ~0.9s/24MP on a 1-core
    # host and would cap the batch queue; on-device it fuses into the
    # TRC epilogue and the readback shrinks 4x
    out_u8: bool = False


def plan(frame, pp, fast=False, out_u8=False):
    """Compile ProcParams + frame metadata into (config, data).

    fast=True is the reference's fast_pipeline (-q, simpleprocess.cc:89-110):
    only active when resize is enabled — the image is Lanczos-downscaled
    right after the raw stage and every later op runs at output scale;
    demosaic is downgraded (3-pass X-Trans -> 1-pass, pixelshift -> amaze,
    adjust_procparams :533-549) and crop coordinates are scaled
    (stage_finish :362-366).
    """
    fast = bool(fast and pp.resize.enabled)
    if fast:
        import copy as _copy

        pp = _copy.deepcopy(pp)
        if pp.raw.xtrans.method.lower().startswith("3-pass"):
            pp.raw.xtrans.method = "1-pass (medium)"
        if pp.raw.bayer.method.lower() == "pixelshift":
            pp.raw.bayer.method = "amaze"
    icc_working = pp.icm.working_profile
    if icc_working not in cs.MATRICES_RGB_TO_XYZ:
        icc_working = "Rec2020"

    data = {}
    ctx = {
        "working_profile": icc_working,
        "frame": frame,
        "pp": pp,
    }

    if frame.is_raw:
        # Sigma Foveon X3F: 3 full-res planes, no mosaic (ST_FOVEON,
        # rawimage.cc:115; filters=0 per dcraw.cc:9917). Demosaic is a
        # passthrough; CFA-domain preprocessing does not apply.
        foveon = frame.cfa.ndim == 3
        h, w = frame.cfa.shape[-2:]
        pm = settings.pad_multiple
        shape = (((h + pm - 1) // pm) * pm, ((w + pm - 1) // pm) * pm)
        # raw scaling plan (scaleColors)
        bayer_adjust = None
        if frame.pattern is not None and pp.raw.bayer.black_enabled:
            b = pp.raw.bayer
            bayer_adjust = [b.black1, b.black0, b.black2, b.black3]
        raw_expos = pp.raw.expos if pp.raw.expos_enabled else 1.0
        if foveon:
            method = "foveon"
        else:
            method = (pp.raw.bayer.method if frame.pattern is not None
                      else pp.raw.xtrans.method)
        # pixel-shift needs the 3 extra frames; single-frame files fall
        # back to the flagship method (rawimagesource.cc:1888 fallback)
        pixelshift = False
        if method.lower() == "pixelshift":
            extra = getattr(frame, "extra_frames", None)
            if extra is not None and len(extra) == 3:
                pixelshift = True
                data["ps_frames"] = pad_to_multiple(
                    np.asarray(extra, np.float32),
                    settings.pad_multiple)[0]
            else:
                method = "amaze"
        dem_kwargs = []
        ml = method.lower()
        if (ml.endswith("bilinear") or ml.endswith("vng4")
                or ml.startswith("4-pass")):
            sensor = (pp.raw.bayer if frame.pattern is not None
                      else pp.raw.xtrans)
            dem_kwargs += [
                ("dual_contrast", float(sensor.dual_demosaic_contrast)),
                ("dual_auto", bool(sensor.dual_demosaic_auto_contrast))]
        if ml == "lmmse":
            dem_kwargs.append(
                ("iterations", int(pp.raw.bayer.lmmse_iterations)))
        if ml.startswith("dcb"):
            dem_kwargs += [
                ("iterations", int(pp.raw.bayer.dcb_iterations)),
                ("enhance", bool(pp.raw.bayer.dcb_enhance))]

        # chosen WB in ColorTemp multiplier convention (getWB / simpleprocess
        # stage_init) — camera WB is the identity in this convention.
        if pp.wb.enabled and pp.wb.method in ("Custom", "CustomTemp"):
            wb_mults = wbmod.temp2mul(pp.wb.temperature, pp.wb.green,
                                      pp.wb.equal)
        elif pp.wb.enabled and pp.wb.method in ("CustomMult",
                                                "CustomMultLegacy"):
            m = np.asarray(pp.wb.mult, dtype=np.float64)
            wb_mults = np.array([m[0] / m[1], 1.0, m[2] / m[1]])
        elif pp.wb.enabled and pp.wb.method == "Auto" and not foveon:
            from art_tpu.pipeline.autos import auto_wb_multipliers

            wb_mults = auto_wb_multipliers(frame)
            try:
                from art_tpu.pipeline.listeners import report_auto
                from art_tpu.raw.wb import mul2temp

                report_auto("wb", mul2temp(*np.asarray(wb_mults)[:3]))
            except Exception:
                pass
        else:
            wb_mults = frame.camera_wb_mults()

        if foveon:
            splan = rawpre.scale_plan_foveon(frame, raw_expos, wb_mults)
            data["raw_offset"] = splan["offset3"]
            data["raw_scale"] = splan["scale3"]
        else:
            splan = rawpre.scale_plan(
                frame, bayer_adjust, raw_expos,
                is_mono=(method == "mono"), wb_mults_rgb=wb_mults)
            data["raw_offset"] = splan["offset_tile"]
            data["raw_scale"] = splan["scale_tile"]

        mults, gain = wbmod.image_multipliers(
            frame, wb_mults, splan["scale_mul"], splan["c_white"],
            splan["cblack"], raw_expos, is_mono=(method == "mono"))
        data["rgb_mults"] = mults.astype(np.float32)
        data["init_gain"] = np.float32(splan["gain"])

        # user .badpixels file (dfmanager.cc getBadPixels)
        from art_tpu.raw.badpixfile import (badpixel_mask,
                                            find_badpixels_for,
                                            parse_badpixels_file)

        bp_file = (None if foveon
                   else find_badpixels_for(frame.make, frame.model))
        if bp_file:
            pts = parse_badpixels_file(bp_file)
            if pts:
                m = badpixel_mask(pts, frame.cfa.shape)
                mp, _ = pad_to_multiple(m.astype(np.float32),
                                        settings.pad_multiple)
                data["badpix_mask"] = mp

        # raw preprocessing flags (preprocess, rawimagesource.cc:1479-1845)
        hotdead = None
        if pp.raw.hotdead_enabled and (pp.raw.hotpixel_filter
                                       or pp.raw.deadpixel_filter):
            hotdead = (bool(pp.raw.hotpixel_filter),
                       bool(pp.raw.deadpixel_filter),
                       float(pp.raw.hotdead_thresh))
        green_eq_t = 0.0
        if (frame.pattern is not None and pp.raw.bayer.green_eq_enabled
                and pp.raw.bayer.green_eq > 0):
            green_eq_t = float(pp.raw.bayer.green_eq) / 100.0
        linedn = 0.0
        linedn_dir = 3
        if (frame.pattern is not None and pp.raw.bayer.green_eq_enabled
                and pp.raw.bayer.linenoise > 0):
            linedn = float(pp.raw.bayer.linenoise)
            linedn_dir = int(pp.raw.bayer.linenoise_direction)
        pdaf = False
        if frame.pattern is not None and pp.raw.bayer.pdaf_lines_filter:
            from art_tpu.raw.camconst import get_instance as _cc

            cc = _cc().get(frame.make, frame.model)
            pd = cc.pdaf() if cc is not None else None
            if pd:
                from art_tpu.raw.pdaf import pdaf_row_mask

                rows_, off_ = pd
                data["pdaf_rows"] = pdaf_row_mask(
                    rows_, off_, shape[0]).astype(np.float32)
                pdaf = True
        ca_mode = None
        if frame.pattern is not None and pp.raw.ca_enabled:
            if pp.raw.ca_autocorrect:
                ca_mode = ("auto", 0.0, 0.0)
            elif pp.raw.ca_red != 0 or pp.raw.ca_blue != 0:
                ca_mode = ("manual", float(pp.raw.ca_red),
                           float(pp.raw.ca_blue))

        # dark frame / flat field (copyOriginalPixels, rawflatfield.cc)
        import os as _os

        darkframe = False
        df_path = pp.raw.df_file if (pp.raw.df_enabled and not foveon
                                     and pp.raw.df_file) else ""
        if pp.raw.df_enabled and pp.raw.df_autoselect and not foveon:
            from art_tpu.raw.dfff_managers import df_manager

            found = df_manager().search(
                frame.make, frame.model, frame.iso,
                frame.exif.get("exposure_time", 0.0))
            if found:
                df_path = found
        if df_path and _os.path.isfile(df_path):
            from art_tpu.io.rawfile import load_raw as _lr

            df = _lr(df_path)
            if df.cfa.shape == frame.cfa.shape:
                dfp, _ = pad_to_multiple(df.cfa, settings.pad_multiple)
                data["df_plane"] = np.asarray(dfp, dtype=np.float32)
                darkframe = True
        # embedded DNG gain map (FlatFieldUseEmbedded, gainmap.cc:179)
        gainmap = False
        if (pp.raw.ff_enabled and pp.raw.ff_embedded and frame.filename
                and not foveon):
            try:
                from art_tpu.io.gainmap import (build_gain_plane,
                                                parse_gain_maps,
                                                read_opcodelist2)

                maps = parse_gain_maps(read_opcodelist2(frame.filename))
                sf = max((100.0 - float(pp.raw.ff_clip_control)) / 100.0,
                         0.01)
                plane = build_gain_plane(maps, frame.cfa.shape, sf)
                if plane is not None:
                    gp, _ = pad_to_multiple(plane, settings.pad_multiple)
                    # pad region gain defaults to 1
                    gp = np.asarray(gp, dtype=np.float32)
                    data["gain_plane"] = gp
                    gainmap = True
            except Exception:
                gainmap = False
        flatfield = None
        ff_path = pp.raw.ff_file if (pp.raw.ff_enabled and not foveon
                                     and pp.raw.ff_file) else ""
        if (not gainmap and pp.raw.ff_enabled and pp.raw.ff_autoselect
                and not foveon):
            from art_tpu.raw.dfff_managers import ff_manager

            found = ff_manager().search(
                frame.make, frame.model,
                frame.exif.get("lens_model", ""),
                frame.exif.get("focal_length", 0.0),
                frame.exif.get("f_number", 0.0))
            if found:
                ff_path = found
        if not gainmap and ff_path and _os.path.isfile(ff_path):
            from art_tpu.io.rawfile import load_raw as _lr

            ff = _lr(ff_path)
            if ff.cfa.shape == frame.cfa.shape:
                ffp, _ = pad_to_multiple(ff.cfa, settings.pad_multiple)
                data["ff_plane"] = np.asarray(ffp, dtype=np.float32)
                bt = (pp.raw.ff_blur_type or "area").lower()
                bt = {"area flatfield": "area", "vertical": "v",
                      "horizontal": "h", "v+h": "vh"}.get(bt, bt)
                flatfield = (bt, int(pp.raw.ff_blur_radius))

        # LCP vignette on the raw plane (rawimagesource.cc:1670-1704)
        lp = pp.lens_prof
        if (lp.method == "lcp" and lp.lcp_file and lp.use_vign
                and not foveon):
            from art_tpu.lens.lcp import parse_lcp

            prof = parse_lcp(lp.lcp_file)
            if prof is not None and not prof.is_fisheye:
                vm = prof.vignette(
                    float(frame.exif.get("focal_length", 0.0) or 0.0),
                    float(frame.exif.get("f_number", 0.0) or 0.0))
                if vm is not None:
                    x0, y0, fx, fy = vm.geometry(w, h, float(
                        frame.exif.get("focal_length", 0.0) or 0.0))
                    data["lcp_vign"] = np.asarray(
                        [x0, y0, 1.0 / fx, 1.0 / fy] + list(vm.vign_param()),
                        dtype=np.float32)
        # metadata-embedded / lensfun vignette on the raw plane
        # (lensexif.cc processVignette :617, rtlensfun.cc processVignette)
        elif (lp.method in ("exif", "lfauto", "lfmanual") and lp.use_vign
              and not foveon):
            if lp.method == "exif":
                from art_tpu.lens import exifcorr

                corr = exifcorr.for_frame(frame)
            else:
                from art_tpu.lens import lensfun

                corr = lensfun.for_frame(pp, frame)
            if corr is not None and corr.has_vign:
                if corr.kind == "spline":
                    data["exif_vign"] = np.stack(
                        [corr.knots, corr.vig]).astype(np.float32)
                else:
                    cx = corr.center_v[0] * w
                    cy = corr.center_v[1] * h
                    m2 = 1.0 / (max(cx, w - cx) ** 2 + max(cy, h - cy) ** 2)
                    data["exif_vign_dng"] = np.asarray(
                        [cx, cy, m2] + list(corr.vign_radial), np.float32)

        # highlight reconstruction mode (getImage, rawimagesource.cc:883-900)
        # (HL recovery is CFA-clip-model based; not applicable to Foveon)
        hl_mode = "Off"
        if (pp.exposure.enabled and pp.exposure.hrmode != "Off"
                and not foveon):
            hl_mode = {"Blend": "blend", "Color": "inpaint",
                       "ColorSoft": "opposed"}.get(pp.exposure.hrmode, "Off")
        if hl_mode != "Off":
            wb_cam = wbmod.wb_camera_multipliers(frame, wb_mults)
            data["hl_scale_mul"] = splan["scale_mul"][:3].astype(np.float32)
            data["hl_wb_cam"] = wb_cam.astype(np.float32)
            data["hl_max"] = (splan["clmax"] * mults).astype(np.float32)

        # cam -> working matrix (colorSpaceConversion_ default path:
        # work_inv @ xyz_cam with xyz_cam = xyz_sRGB(D50) @ rgb_cam)
        rgb_cam, _, _ = frame.color_matrices()
        xyz_cam = cs.MATRICES_RGB_TO_XYZ["sRGB"] @ rgb_cam
        cam2work = cs.MATRICES_XYZ_TO_RGB[icc_working] @ xyz_cam
        data["cam2work"] = cam2work.astype(np.float32)
        do_clip = not (pp.exposure.enabled and pp.exposure.hrmode != "Off")

        # DCP input profile (dcp.cc; replaces the plain matrix transform)
        dcp_static = None
        icc_input_trc = None
        ip = pp.icm.input_profile
        if isinstance(ip, str) and ip.lower().endswith((".icc", ".icm")):
            # camera input ICC (iccstore.cc custom input profiles):
            # shaper-matrix device->PCS replaces cam2work; the TRC
            # linearizes device values before the matrix
            import os as _os

            if _os.path.isfile(ip):
                try:
                    from art_tpu.color.iccfile import load_icc

                    prof = load_icc(ip)
                    if prof.get("kind") == "lut":
                        # LUT-class camera profile: device->PCS via the
                        # A2B pipeline, then XYZ(D50)->working matrix
                        # (iccstore.cc lcms slow path, on device here)
                        if prof["a2b"] is not None:
                            from art_tpu.color.icclut import plan_lut

                            stages, ldata = plan_lut(prof["a2b"],
                                                     prof["pcs"], "in")
                            for k, v in ldata.items():
                                data[f"iccin:{k}"] = v
                            data["cam2work"] = (
                                cs.MATRICES_XYZ_TO_RGB[icc_working]
                                .astype(np.float32))
                            icc_input_trc = ("icclut", stages)
                    else:
                        data["cam2work"] = (
                            cs.MATRICES_XYZ_TO_RGB[icc_working]
                            @ prof["rgb_to_xyz"]).astype(np.float32)
                        if prof["trc"][0] != "linear":
                            icc_input_trc = prof["trc"]
                except Exception:
                    pass
        if isinstance(ip, str) and ip.lower().endswith(".dcp"):
            import os as _os

            from art_tpu.color.dcp import load_dcp, plan_dcp

            if _os.path.isfile(ip):
                if pp.wb.enabled and pp.wb.method in ("Custom",
                                                      "CustomTemp"):
                    wb_temp = float(pp.wb.temperature)
                else:
                    wb_temp, _ = wbmod.mul2temp(*np.asarray(wb_mults)[:3])
                dcp_static, dcp_step2, dcp_data = plan_dcp(
                    load_dcp(ip), frame, wb_temp,
                    cs.MATRICES_XYZ_TO_RGB[icc_working], icm=pp.icm)
                if dcp_step2 is not None:
                    # step-2 look/tone runs inside the op chain (the
                    # early/late look position, improcfun.cc:590,614) —
                    # planned by ops.dcplook from this ctx entry
                    s2_keys = ("dcp_work2pro", "dcp_pro2work",
                               "dcp_look", "dcp_tc")
                    ctx["dcp_step2"] = (dcp_step2, {
                        k: dcp_data[k] for k in s2_keys if k in dcp_data})
                for k in ("dcp_work2pro", "dcp_look", "dcp_tc"):
                    dcp_data.pop(k, None)
                data.update(dcp_data)
    else:
        hotdead = None
        green_eq_t = 0.0
        hl_mode = "Off"
        linedn = 0.0
        linedn_dir = 3
        ca_mode = None
        h, w = frame.shape
        rgb_padded, _ = pad_to_multiple(frame.rgb, settings.pad_multiple)
        shape = rgb_padded.shape[1:]
        # non-raw sources arrive in linear sRGB 0..65535
        data["cam2work"] = cs.working_space_matrix(
            "sRGB", icc_working).astype(np.float32)
        do_clip = False
        method = "none"
        dem_kwargs = []

    # auto log encoding (getAutoLog, simpleprocess stage_init autos)
    if frame.is_raw and pp.logenc.enabled and (pp.logenc.auto_gain
                                               or pp.logenc.auto_gray):
        from art_tpu.pipeline.autos import auto_log_params

        try:
            gain, black_ev, white_ev = auto_log_params(frame, pp)
            from art_tpu.pipeline.listeners import report_auto

            report_auto("log", (gain, black_ev, white_ev))
            if pp.logenc.auto_gain:
                pp.logenc.gain = gain
                pp.logenc.black_ev = black_ev
                pp.logenc.white_ev = white_ev
            pp.logenc.auto_gain = False
            pp.logenc.auto_gray = False
        except Exception:
            pass

    # histogram-matched tone curve (histmatching.cc:444): derive the curve
    # from the embedded camera JPEG against a neutral render
    if (frame.is_raw and pp.tone_curve.histmatching
            and not pp.tone_curve.from_histmatching and frame.filename):
        try:
            from art_tpu.io.metadata import embedded_thumb
            from art_tpu.pipeline.autos import (_subsample_frame,
                                                histogram_matching_curve)

            thumb = embedded_thumb(frame.filename)
            if thumb is not None:
                from art_tpu.params.procparams import ProcParams

                neutral = ProcParams()
                neutral.raw.bayer.method = "fast"
                small = develop(_subsample_frame(frame, 8), neutral)
                pts = histogram_matching_curve(np.asarray(small), thumb)
                pp.tone_curve.enabled = True
                pp.tone_curve.curve = pts
                pp.tone_curve.from_histmatching = True
                from art_tpu.pipeline.listeners import report_auto

                report_auto("matched_curve", pts)
        except Exception:
            pass

    # coarse rotation / flips (getImage tran, rtengine coarse transform)
    coarse = (int(pp.coarse.rotate // 90) % 4, bool(pp.coarse.hflip),
              bool(pp.coarse.vflip))
    if coarse[0] % 2 == 1:
        h, w = w, h  # rot90 swaps output dims

    # fast-export early resize (stage_early_resize, simpleprocess.cc:492):
    # scale factor from the FULL post-coarse dims, applied right after the
    # raw stage; crop coordinates below are then scaled (:362-366) and the
    # final resize is skipped (:404 is_fast)
    early_resize = None
    fast_scale = 1.0
    if fast:
        fast_scale = _resize_scale(pp, h, w)
        if fast_scale != 1.0:
            oh = int(h * fast_scale + 0.5)
            ow = int(w * fast_scale + 0.5)
            # sensor-orientation target (early resize runs pre-coarse)
            k = int(pp.coarse.rotate // 90) % 4
            th, tw = (ow, oh) if k % 2 == 1 else (oh, ow)
            sh0, sw0 = (w, h) if k % 2 == 1 else (h, w)
            from art_tpu.ops.resize import resize_plan

            a_r, a_c = resize_plan((sh0, sw0), (th, tw))
            data["early_rows"] = a_r
            data["early_cols"] = a_c
            early_resize = (sh0, sw0, th, tw)
            h, w = oh, ow
        else:
            fast = False

    # geometric transform (stage_transform, iptransform.cc; in fast mode
    # it runs post-early-resize at output scale, simpleprocess.cc:106-108)
    from art_tpu.pipeline.transform import needs_transform, plan_transform

    # auto-distortion (simpleprocess.cc:333: getAutoDistor before the
    # transform plan); mutate a copy so the caller's pp stays untouched
    if (pp.distortion.enabled and pp.distortion.auto_compute
            and frame.is_raw and frame.cfa is not None):
        from art_tpu.lens.autos import auto_distortion_for

        amt = auto_distortion_for(frame)
        if amt != 0.0:
            import copy as _copy

            pp = _copy.deepcopy(pp)
            pp.distortion.amount = amt
    do_transform = frame.is_raw is not None and needs_transform(pp, frame)
    if do_transform:
        data["transform"] = plan_transform(pp, (h, w), frame=frame)

    # crop (reference stage_finish crop copy, simpleprocess.cc:357-383;
    # in fast mode coordinates are scaled, :362-366)
    crop = None
    if pp.crop.enabled:
        sf = fast_scale if early_resize is not None else 1.0
        cx = max(0, int(pp.crop.x * sf + 0.5))
        cy = max(0, int(pp.crop.y * sf + 0.5))
        cw0 = int(pp.crop.w * sf + 0.5) if pp.crop.w > 0 else w
        ch0 = int(pp.crop.h * sf + 0.5) if pp.crop.h > 0 else h
        cw = min(cw0, w - cx)
        ch = min(ch0, h - cy)
        if (cx, cy, cw, ch) != (0, 0, w, h):
            crop = (cy, cx, ch, cw)

    # resize target (ipresize.cc resizeScale semantics incl. AppliesTo)
    resize_to = None
    if pp.resize.enabled and early_resize is None:
        scale_f = _resize_scale(pp, h, w, crop)
        src_h = crop[2] if crop else h
        src_w = crop[3] if crop else w
        if scale_f != 1.0:
            oh = max(32, int(src_h * scale_f + 0.5))
            ow = max(32, int(src_w * scale_f + 0.5))
            if (oh, ow) != (src_h, src_w):
                resize_to = (oh, ow)
                from art_tpu.ops.resize import resize_plan

                a_r, a_c = resize_plan((src_h, src_w), resize_to)
                data["resize_rows"] = a_r
                data["resize_cols"] = a_c

    # late-crop path: with no geometry change, keep the lane-aligned padded
    # planes through stages 1-3 and slice at the very end; (h,w)-shaped op
    # data planes (masks etc.) are edge-padded to match
    late_crop = (coarse == (0, False, False) and not do_transform
                 and crop is None and early_resize is None)

    # op chain with stage tags (SURVEY §2.4 execution order). Stage 1-3
    # ops run post-coarse/early-resize (and post-crop) — op planners
    # rasterize masks etc. at ctx["op_dims"] (the reference's setViewport
    # crop offset, simpleprocess.cc:368, is applied by slicing below).
    ctx["op_dims"] = (h, w)
    stage_of = {}
    for nm in ops_pkg.STAGE_0:
        stage_of[nm] = 0
    for nm in ops_pkg.STAGE_1:
        stage_of[nm] = 1
    for nm in ops_pkg.STAGE_2:
        stage_of[nm] = 2
    for nm in ops_pkg.STAGE_3:
        stage_of[nm] = 3
    steps = []
    for name in ops_pkg.ALL_STEPS:
        mod = ops_pkg.get_op(name)
        if mod is None:
            continue
        plan_fn = mod.plan
        if "_" in name:  # positional variants: filmsim_post, dcplook_*
            suffix = name.rsplit("_", 1)[1]
            plan_fn = getattr(mod, f"plan_{suffix}", mod.plan)
        planned = plan_fn(pp, ctx)
        if planned is None:
            continue
        static, op_data = planned
        steps.append((name, tuple(static), stage_of.get(name, 3)))
        data[f"op:{name}"] = op_data

    def _map_tree(obj, fn):
        if isinstance(obj, dict):
            return {k: _map_tree(v, fn) for k, v in obj.items()}
        if isinstance(obj, (list, tuple)):
            return type(obj)(_map_tree(v, fn) for v in obj)
        return fn(obj)

    if late_crop:
        # edge-pad (h, w) op planes to the lane-aligned padded shape
        def _pad_plane(a):
            if (isinstance(a, np.ndarray) and a.ndim >= 2
                    and a.shape[-2:] == (h, w)
                    and a.shape[-2:] != tuple(shape)):
                pad = [(0, 0)] * (a.ndim - 2) + [
                    (0, shape[0] - h), (0, shape[1] - w)]
                return np.pad(a, pad, mode="edge")
            return a

        for name, _, stage in steps:
            if stage > 0:
                data[f"op:{name}"] = _map_tree(data[f"op:{name}"],
                                               _pad_plane)
    elif crop is not None:
        # slice full-frame op planes to the crop window so masks keep
        # full-image coordinates (ipf.setViewport semantics)
        cy, cx, ch, cw = crop

        def _crop_plane(a):
            if (isinstance(a, np.ndarray) and a.ndim >= 2
                    and a.shape[-2:] == (h, w)):
                return np.ascontiguousarray(
                    a[..., cy : cy + ch, cx : cx + cw])
            return a

        for name, _, stage in steps:
            if stage > 0:
                data[f"op:{name}"] = _map_tree(data[f"op:{name}"],
                                               _crop_plane)

    # post-resize sharpening (prsharpening, simpleprocess.cc:402-418)
    prsharp = None
    if resize_to is not None and pp.pr_sharpening.enabled:
        from art_tpu.ops import sharpen as sharpen_mod

        planned = sharpen_mod.plan_pr(pp, ctx)
        if planned is not None:
            prsharp, pr_data = planned
            data["op:prsharpen"] = pr_data

    # output transform (rgb2out fast path: matrix + TRC). User .icc
    # files reduce to the same pair via color.iccfile.
    from art_tpu.color.iccstore import get_instance

    out_prof = _resolve_output_profile(pp.icm.output_profile)
    if out_prof.lower().endswith((".icc", ".icm")):
        try:
            from art_tpu.color.iccfile import load_icc

            prof = load_icc(out_prof)
            if prof.get("kind") == "lut":
                # LUT-class output profile (printer/look): work -> XYZ
                # matrix, then the B2A pipeline to device values
                if prof["b2a"] is None:
                    raise ValueError("LUT output profile has no B2A0")
                from art_tpu.color.icclut import plan_lut

                stages, ldata = plan_lut(prof["b2a"], prof["pcs"], "out")
                for k, v in ldata.items():
                    data[f"iccout:{k}"] = v
                out_mat = np.eye(3)  # work2out becomes work -> XYZ(D50)
                out_trc = ("icclut", stages)
            else:
                out_mat = prof["rgb_to_xyz"]
                out_trc = prof["trc"]
        except Exception:
            out_prof = "sRGB"
            out_mat = cs.MATRICES_RGB_TO_XYZ["sRGB"]
            out_trc = get_instance().output_profile("sRGB").trc
    else:
        out_mat = cs.MATRICES_RGB_TO_XYZ[out_prof]
        out_trc = get_instance().output_profile(out_prof).trc
    work2out = (np.linalg.inv(out_mat)
                @ cs.MATRICES_RGB_TO_XYZ[icc_working])
    data["work2out"] = work2out.astype(np.float32)

    config = PipelineConfig(
        pattern=frame.pattern if frame.is_raw else None,
        xtrans=frame.xtrans,
        is_raw=frame.is_raw,
        demosaic_method=method,
        pixelshift=pixelshift,
        do_clip=do_clip,
        working_profile=icc_working,
        out_trc=out_trc,
        shape=tuple(shape),
        orig_shape=(h, w),
        steps=tuple(steps),
        late_crop=late_crop,
        crop=crop,
        resize_to=resize_to,
        early_resize=early_resize,
        prsharp=prsharp,
        hotdead=hotdead,
        green_eq=green_eq_t,
        hl_mode=hl_mode,
        pdaf=pdaf if frame.is_raw else False,
        badpix_file="badpix_mask" in data,
        darkframe=darkframe if frame.is_raw else False,
        flatfield=flatfield if frame.is_raw else None,
        gainmap=gainmap if frame.is_raw else False,
        dem_kwargs=tuple(dem_kwargs) if frame.is_raw else (),
        dcp=dcp_static if frame.is_raw else None,
        icc_input_trc=icc_input_trc if frame.is_raw else None,
        coarse=coarse,
        transform=do_transform,
        linedn=(linedn, linedn_dir),
        ca_mode=ca_mode,
        out_u8=bool(out_u8),
    )
    return config, data


def _resize_scale(pp, h, w, crop=None):
    """resizeScale (ipresize.cc:226): scale factor incl. AppliesTo and the
    apply-site upscale gate (simpleprocess.cc:404-408)."""
    rs = pp.resize
    if not rs.enabled:
        return 1.0
    if crop is not None and rs.applies_to == "Cropped area":
        refh, refw = crop[2], crop[3]
    else:
        refh, refw = h, w
    ds = rs.data_specified
    if ds == 1:
        scale = rs.width / refw if rs.width > 0 else 1.0
    elif ds == 2:
        scale = rs.height / refh if rs.height > 0 else 1.0
    elif ds == 3:  # fit box
        sw = rs.width / refw if rs.width > 0 else 1.0
        sh = rs.height / refh if rs.height > 0 else 1.0
        scale = min(sw, sh)
        if scale > 1.0 and not rs.allow_upscaling:
            scale = 1.0
    else:
        scale = rs.scale
    if abs(scale - 1.0) <= 1e-5:
        return 1.0
    if scale > 1.0 and not rs.allow_upscaling:
        return 1.0
    return scale


def _resolve_output_profile(name: str) -> str:
    """Map an output-profile name to a named colorspace, or return the
    path itself for a user .icc/.icm file (iccstore.cc:224-366: arbitrary
    profile files resolve by path or by basename in the user icc dir)."""
    import os as _os

    n = (name or "").lower()
    if n.endswith((".icc", ".icm")):
        if _os.path.isfile(name):
            return name
        from art_tpu.settings import settings as _st

        if _st.user_dir:
            cand = _os.path.join(_st.user_dir, "iccprofiles",
                                 _os.path.basename(name))
            if _os.path.isfile(cand):
                return cand
    if "2020" in n:
        return "Rec2020"
    if "adobe" in n or "medium" in n:
        return "Adobe RGB"
    if "prophoto" in n or "large" in n:
        return "ProPhoto"
    if "acesp0" in n:
        return "ACESp0"
    if "acesp1" in n or "ap1" in n:
        return "ACESp1"
    return "sRGB"


def _mat3(m, rgb):
    # explicit muladds: on TPU a (3,3)x(3,HW) einsum would hit the MXU at
    # bf16 default precision — a 0.4% color error; the VPU form is exact f32
    # and fuses into the surrounding elementwise chain.
    return jnp.stack([
        m[0, 0] * rgb[0] + m[0, 1] * rgb[1] + m[0, 2] * rgb[2],
        m[1, 0] * rgb[0] + m[1, 1] * rgb[1] + m[1, 2] * rgb[2],
        m[2, 0] * rgb[0] + m[2, 1] * rgb[1] + m[2, 2] * rgb[2],
    ])


def _build_run(config: PipelineConfig):
    """Build the (un-jitted) device program for a config."""

    # Pass-fusion gates (static per config). Each whole-plane elementwise
    # pass costs ~2-3ms at 24MP; the hot default pipeline folds the raw
    # head (WB mults + clip + cam2work) into the fused denoise kernel and
    # the rgb2out tail (work2out + TRC) into the neutral tone-curve kernel.
    first0 = next((s for s in config.steps if s[2] == 0), None)
    fuse_head = (
        settings.fuse_passes
        and config.is_raw and first0 is not None and first0[0] == "denoise"
        and len(first0[1]) >= 5
        and first0[1][1] == 0 and first0[1][2] == 0 and not first0[1][4]
        and config.hl_mode != "blend" and config.do_clip
        and config.early_resize is None and config.dcp is None
        and config.icc_input_trc is None and not config.pixelshift)
    late_steps = [s for s in config.steps if s[2] > 0]
    fuse_tail = (
        settings.fuse_passes
        and config.resize_to is None and bool(late_steps)
        and late_steps[-1][0] == "tonecurve"
        and bool(late_steps[-1][1]) and late_steps[-1][1][0] == "neutral"
        and config.out_trc[0] in ("srgb", "linear"))

    def run(inp, data):
        # raw counts ship to the device as uint16 (halves the H2D bytes
        # at 24MP; decoded raws are integral by construction) and widen
        # to f32 on device, fused into the first pass
        if inp.dtype != jnp.float32:
            inp = inp.astype(jnp.float32)
        if config.is_raw and config.demosaic_method == "foveon":
            # Foveon: per-channel scaleColors on the (3, H, W) stack;
            # demosaic is the identity (ST_FOVEON has no mosaic)
            rgb = jnp.maximum(
                (inp - data["raw_offset"]) * data["raw_scale"], 0.0)
            if not fuse_head:
                rgb = rgb * data["rgb_mults"][:, None, None]
                if config.do_clip:
                    rgb = jnp.clip(rgb, 0.0, MAXVAL)
        elif config.is_raw:
            if config.darkframe:
                from art_tpu.raw.dfff import subtract_dark

                inp = subtract_dark(inp, data["df_plane"])
            if config.gainmap:
                # (raw - black)*gain + black on the raw ADUs; black comes
                # from the same periodic offset tile used by apply_scale
                off = data["raw_offset"]
                th = off.shape[0]
                hh, ww = inp.shape
                v = inp.reshape(hh // th, th, ww)
                v = (v - off[None]) * data["gain_plane"].reshape(
                    hh // th, th, ww) + off[None]
                inp = jnp.maximum(v.reshape(hh, ww), 0.0)
            if config.flatfield is not None:
                bt, rad = config.flatfield
                if config.pattern is not None:
                    from art_tpu.raw.dfff import apply_flatfield_bayer

                    inp = apply_flatfield_bayer(inp, data["ff_plane"],
                                                bt, rad)
                elif config.xtrans is not None:
                    from art_tpu.core.image import xtrans_color_index_device
                    from art_tpu.raw.dfff import apply_flatfield_xtrans

                    cidx = xtrans_color_index_device(
                        config.xtrans, inp.shape)
                    inp = apply_flatfield_xtrans(inp, data["ff_plane"],
                                                 cidx, bt, rad)
            cfa = rawpre.apply_scale(inp, data["raw_offset"],
                                     data["raw_scale"], jnp)
            if "lcp_vign" in data:
                # vignette gain series on normalized radius (lcp.cc
                # processVignetteLine :1151)
                v = data["lcp_vign"]
                hh2, ww2 = cfa.shape
                ydv = ((jnp.arange(hh2, dtype=cfa.dtype)[:, None] - v[1])
                       * v[3]) ** 2
                xdv = ((jnp.arange(ww2, dtype=cfa.dtype)[None, :] - v[0])
                       * v[2]) ** 2
                rs = xdv + ydv
                factor = rs * (v[4] + rs * (v[5] - v[6] * rs
                                            + v[7] * rs * rs))
                cfa = cfa * (1.0 + factor)
            if "exif_vign" in data:
                # spline gain on normalized radius; raw divided by sf^2
                # (lensexif.cc:622-630)
                v = data["exif_vign"]
                hh2, ww2 = cfa.shape
                w2e, h2e = ww2 * 0.5, hh2 * 0.5
                rn = 1.0 / jnp.sqrt(w2e * w2e + h2e * h2e)
                ydv = (jnp.arange(hh2, dtype=cfa.dtype)[:, None] - h2e) ** 2
                xdv = (jnp.arange(ww2, dtype=cfa.dtype)[None, :] - w2e) ** 2
                sf = jnp.interp(rn * jnp.sqrt(ydv + xdv), v[0], v[1])
                cfa = cfa / (sf * sf)
            if "exif_vign_dng" in data:
                # FixVignetteRadial polynomial gain (lensexif.cc:632-644)
                v = data["exif_vign_dng"]
                hh2, ww2 = cfa.shape
                ydv = (jnp.arange(hh2, dtype=cfa.dtype)[:, None] - v[1]) ** 2
                xdv = (jnp.arange(ww2, dtype=cfa.dtype)[None, :] - v[0]) ** 2
                r2 = v[2] * (ydv + xdv)
                gain = 1.0 + r2 * (v[3] + r2 * (v[4] + r2 * (
                    v[5] + r2 * (v[6] + r2 * v[7]))))
                cfa = cfa * gain
            if config.badpix_file and config.pattern is not None:
                from art_tpu.core.image import bayer_channel_masks
                from art_tpu.raw.badpixels import interpolate_bad_bayer

                _, mg, _ = bayer_channel_masks(config.pattern, cfa.shape)
                cfa = interpolate_bad_bayer(
                    cfa, data["badpix_mask"] > 0.5, mg)
            if config.hotdead is not None and config.pattern is not None:
                from art_tpu.core.image import bayer_channel_masks
                from art_tpu.raw.badpixels import (find_hot_dead,
                                                   interpolate_bad_bayer)

                find_hot, find_dead, thr = config.hotdead
                _, mg, _ = bayer_channel_masks(config.pattern, cfa.shape)
                bad = find_hot_dead(cfa, thr, find_hot, find_dead)
                cfa = interpolate_bad_bayer(cfa, bad, mg)
            if config.green_eq > 0 and config.pattern is not None:
                from art_tpu.core.image import bayer_channel_masks
                from art_tpu.raw.green_eq import green_equilibrate

                _, mg, _ = bayer_channel_masks(config.pattern, cfa.shape)
                cfa = green_equilibrate(cfa, mg, config.green_eq)
            if config.linedn[0] > 0 and config.pattern is not None:
                from art_tpu.raw.cfa_linedn import cfa_line_denoise

                cfa = cfa_line_denoise(cfa, config.linedn[0],
                                       config.linedn[1])
            if config.pdaf and config.pattern is not None:
                from art_tpu.core.image import bayer_channel_masks
                from art_tpu.raw.pdaf import pdaf_filter

                _, mg, _ = bayer_channel_masks(config.pattern, cfa.shape)
                cfa = pdaf_filter(cfa, mg, data["pdaf_rows"])
            if config.ca_mode is not None and config.pattern is not None:
                from art_tpu.raw.ca_correct import ca_correct

                mode, car, cab = config.ca_mode
                cfa = ca_correct(cfa, config.pattern, auto=(mode == "auto"),
                                 ca_red=car, ca_blue=cab)
            from art_tpu.demosaic import demosaic as dem

            if config.pixelshift:
                from art_tpu.demosaic.pixelshift import pixelshift_combine

                extra = jnp.stack([
                    rawpre.apply_scale(data["ps_frames"][k],
                                       data["raw_offset"],
                                       data["raw_scale"], jnp)
                    for k in range(3)])
                frames4 = jnp.concatenate([cfa[None], extra])
                rgb = pixelshift_combine(frames4, config.pattern,
                                         **dict(config.dem_kwargs))
            else:
                rgb = dem(cfa, config.pattern, config.demosaic_method,
                          xtrans=config.xtrans,
                          init_gain=data["init_gain"],
                          **dict(config.dem_kwargs))
            if config.hl_mode == "opposed":
                from art_tpu.raw.hilite import recover_opposed

                rgb = recover_opposed(rgb, data["hl_scale_mul"],
                                      data["hl_wb_cam"])
            elif config.hl_mode == "inpaint":
                from art_tpu.raw.hilite_inpaint import recover_inpaint

                rgb = recover_inpaint(rgb, data["hl_scale_mul"],
                                      data["hl_wb_cam"])
            if not fuse_head:
                rgb = rgb * data["rgb_mults"][:, None, None]
                if config.hl_mode == "blend":
                    from art_tpu.raw.hilite import recover_blend

                    rgb = recover_blend(rgb, data["hl_max"])
                if config.do_clip:
                    rgb = jnp.clip(rgb, 0.0, MAXVAL)
        else:
            rgb = inp
        if config.early_resize is not None:
            # fast-export: Lanczos to output scale right after the raw
            # stage; everything downstream runs on the small image
            # (stage_early_resize, simpleprocess.cc:492-531)
            from art_tpu.ops.resize import apply_resize as _early_rs

            sh0, sw0, _, _ = config.early_resize
            rgb = rgb[:, :sh0, :sw0]
            rgb = _early_rs(rgb, data["early_rows"], data["early_cols"])
        if fuse_head:
            pass  # mults + clip + cam2work ride the fused denoise kernel
        elif config.is_raw and config.dcp is not None:
            from art_tpu.color.dcp import apply_dcp

            rgb = apply_dcp(rgb, data, config.dcp)
        else:
            if (config.icc_input_trc is not None
                    and config.icc_input_trc[0] == "icclut"):
                # LUT-class camera ICC: device RGB -> PCS XYZ through
                # the A2B element pipeline; cam2work is then XYZ->work
                from art_tpu.color.icclut import apply_stages

                x01 = rgb * (1.0 / MAXVAL)
                r_, g_, b_ = apply_stages(x01[0], x01[1], x01[2],
                                          config.icc_input_trc[1],
                                          data, "iccin:")
                rgb = jnp.stack([r_, g_, b_]) * MAXVAL
            elif config.icc_input_trc is not None:
                # camera ICC shaper curve linearizes device values
                # before the matrix (iccfile.load_icc input profiles)
                rgb = cs.decode_trc(rgb * (1.0 / MAXVAL),
                                    config.icc_input_trc, jnp) * MAXVAL
            rgb = _mat3(data["cam2work"], rgb)

        for name, static, stage in config.steps:
            if stage == 0:
                mod = ops_pkg.get_op(name)
                d = data[f"op:{name}"]
                if fuse_head and (name, static, stage) == first0:
                    d = dict(d)
                    d["pre_mults"] = data["rgb_mults"]
                    d["pre_mat"] = data["cam2work"]
                rgb = mod.apply(rgb, d, static)

        # coarse rotate/flip: orig_shape is post-rotation; recover the
        # sensor shape, drop the pad margin, then rotate/flip. In the
        # late-crop path (no geometry change) the padded planes are kept
        # through stages 1-3 — the slice to true dims happens at the end.
        h0r, w0r = config.orig_shape
        if not config.late_crop:
            k, hflip, vflip = config.coarse
            sh, sw = (w0r, h0r) if k % 2 == 1 else (h0r, w0r)
            rgb = rgb[:, :sh, :sw]
            if k:
                rgb = jnp.rot90(rgb, k=k, axes=(1, 2))
            if hflip:
                rgb = rgb[:, :, ::-1]
            if vflip:
                rgb = rgb[:, ::-1, :]

            if config.transform:
                from art_tpu.pipeline.transform import apply_transform

                rgb = apply_transform(rgb, data["transform"])

            # crop between STAGE_0 and STAGE_1 (stage_finish crop copy)
            if config.crop is not None:
                cy, cx, ch, cw = config.crop
                rgb = rgb[:, cy : cy + ch, cx : cx + cw]

        for name, static, stage in config.steps:
            if stage > 0:
                mod = ops_pkg.get_op(name)
                d = data[f"op:{name}"]
                if fuse_tail and (name, static, stage) == late_steps[-1]:
                    d = dict(d)
                    d["out_mat"] = data["work2out"]
                    static = static + (("epi", config.out_trc),)
                rgb = mod.apply(rgb, d, static)

        late = config.late_crop
        if config.resize_to is not None:
            from art_tpu.ops.resize import apply_resize

            if late:
                rgb = rgb[:, :h0r, :w0r]
                late = False
            rgb = apply_resize(rgb, data["resize_rows"], data["resize_cols"])
            if config.prsharp is not None:
                from art_tpu.ops import sharpen as sharpen_mod

                rgb = sharpen_mod.apply(rgb, data["op:prsharpen"],
                                        config.prsharp)

        # rgb2out: working -> output primaries + TRC encode, to [0,1]
        # (skipped when it rode the neutral tone-curve kernel epilogue)
        if not fuse_tail:
            rgb = _mat3(data["work2out"], rgb)
            rgb = jnp.clip(rgb / MAXVAL, 0.0, 1.0)
            if config.out_trc[0] == "icclut":
                # LUT-class output profile: rgb here is PCS XYZ(D50)
                from art_tpu.color.icclut import apply_stages

                r_, g_, b_ = apply_stages(rgb[0], rgb[1], rgb[2],
                                          config.out_trc[1],
                                          data, "iccout:")
                rgb = jnp.clip(jnp.stack([r_, g_, b_]), 0.0, 1.0)
            else:
                rgb = cs.encode_trc(rgb, config.out_trc, jnp)
        if config.out_u8:
            # emit interleaved (H, W, 3) uint8: the 8-bit encoder wants
            # HWC and the host-side 72MB byte transpose costs ~2s on a
            # 1-core host (free as a device op before readback)
            rgb = (jnp.clip(rgb, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)
            rgb = jnp.transpose(rgb, (1, 2, 0))
        # late-crop programs return the PADDED planes: the slice to true
        # dims is a pure ~0.6 ms HBM copy at 24MP as a device op, but a
        # free view on the host after readback — callers apply
        # `crop_result` to the fetched array.
        return rgb

    return run


def crop_result(out_np, config: PipelineConfig):
    """Slice a fetched executor output to true dims (no-op for programs
    that already cropped/resized on device). out_u8 programs return
    interleaved (H, W, 3) uint8; others planar (3, H, W) float."""
    if not (config.late_crop and config.resize_to is None):
        return out_np
    h0r, w0r = config.orig_shape
    if config.out_u8:
        return out_np[..., :h0r, :w0r, :]
    return out_np[..., :h0r, :w0r]


@functools.lru_cache(maxsize=64)
def _executor(config: PipelineConfig):
    return jax.jit(_build_run(config))


@functools.lru_cache(maxsize=64)
def _executor_batched(config: PipelineConfig, batch: int):
    """Batched device step: one dispatch develops `batch` same-config
    images (stacked inputs + per-image stacked data leaves). The tunnel
    charges ~2.2ms of serial per-execute overhead (tools/profiling/
    microbw.py noop floor); a lax.map body compiles once and chains the
    images inside one program, amortizing it. vmap is not an option —
    the Pallas AMaZE/wavelet stages hold ANY-memspace HBM buffers that
    the batching transform cannot tile."""
    run = _build_run(config)
    return jax.jit(
        lambda xs, ds: jax.lax.map(lambda xd: run(xd[0], xd[1]), (xs, ds)))


def develop(frame, pp, fast=False, out_u8=False):
    """Full develop: returns encoded output RGB (3, H, W) float32 in
    [0,1] (uint8 0-255 with out_u8=True)."""
    config, data = plan(frame, pp, fast=fast, out_u8=out_u8)
    if frame.is_raw:
        inp, _ = pad_to_multiple(frame.cfa, settings.pad_multiple)
    else:
        inp, _ = pad_to_multiple(frame.rgb, settings.pad_multiple)
    if frame.is_raw and frame.integral:
        inp = transfer_array(inp)
    out = _executor(config)(inp, data)
    return crop_result(np.asarray(out), config)


def transfer_array(inp):
    """Narrow an integral float raw plane to uint16 for the H2D copy —
    halves the transfer bytes; the program widens back on device.
    Callers gate on RawFrame.integral (decoded u16 counts)."""
    if inp.dtype == np.float32:
        return inp.astype(np.uint16)
    return inp


def process_image(path_or_frame, pp, fast=False, output_path=None,
                  bits=8, quality=92, uncompressed=False,
                  gamut_warn=None, subsampling=3, listener=None):
    """processImage equivalent (rtengine.h:604, simpleprocess.cc:580).

    gamut_warn: optional proof profile (preset name or matrix .icc
    path); pixels outside its gamut are painted cyan in the result
    (the soft-proof gamut warning of gamutwarning.cc as batch output).

    listener: optional pipeline.listeners.ProgressListener — phase
    milestones + errors (the reference's ProgressListener surface,
    rtengine.h:150-166).

    With settings.verbose, per-phase wall-clock timings print to stdout
    (the reference's `-V` instrumentation, rawimagesource.cc:1470,
    StopWatch.h)."""
    import time as _time

    from art_tpu.io.rawfile import RawFrame
    from art_tpu.pipeline.listeners import notify

    def _tick(label, t0):
        if settings.verbose:
            print(f"[art-tpu] {label}: "
                  f"{(_time.monotonic() - t0) * 1000:.1f} ms", flush=True)
        return _time.monotonic()

    t = _time.monotonic()
    try:
        if isinstance(path_or_frame, RawFrame):
            frame = path_or_frame
        else:
            from art_tpu.io import load_image

            frame = load_image(path_or_frame)
    except Exception as e:
        if listener is not None:
            listener.error(f"load failed: {e}")
        raise
    notify(listener, "decode")
    t = _tick("decode", t)
    from art_tpu.pipeline.listeners import (PipelineListener, _Collect,
                                            fire_autos, wants_histogram)

    if isinstance(listener, PipelineListener) and frame.is_raw:
        listener.image_type_changed(
            True, frame.pattern is not None, frame.xtrans is not None,
            frame.pattern is None and frame.xtrans is None
            and getattr(frame.cfa, "ndim", 2) == 2)
    # 8-bit JPEG output with no host-side post step: convert on device
    u8 = (bits == 8 and gamut_warn is None and output_path is not None
          and str(output_path).lower().endswith((".jpg", ".jpeg")))
    with _Collect() as auto_report:
        out = develop(frame, pp, fast=fast, out_u8=u8)
    fire_autos(listener, auto_report)
    if wants_histogram(listener):
        from art_tpu.pipeline.scopes import histogram_rgbl

        arr = np.asarray(out)
        full = (arr.transpose(2, 0, 1).astype(np.float32)
                * (MAXVAL / 255.0) if u8
                else np.clip(arr, 0.0, 1.0) * MAXVAL)
        listener.histogram_changed(histogram_rgbl(full))
    notify(listener, "develop")
    t = _tick("develop (plan+device+readback)", t)
    if gamut_warn:
        from art_tpu.color.gamutwarning import paint_gamut_warning

        out, _ = paint_gamut_warning(
            out, _resolve_output_profile(pp.icm.output_profile),
            gamut_warn)
        notify(listener, "gamut")
        t = _tick("gamut warning", t)
    if output_path is not None:
        from art_tpu.io.imagefile import save_image

        # metadata tunnel/edit (MetaDataParams.mode: 0=tunnel 1=edit
        # 2=strip; rtengine/metadata.cc semantics)
        exif_bytes = None
        exif_tags = None
        xmp_bytes = None
        iptc_iim = None
        if pp.metadata.mode != 2 and frame.filename:
            try:
                from art_tpu.io.metadata import build_exif_bytes, harvest
                from art_tpu.io.xmp import (build_iptc_iim, read_xmp_sidecar,
                                            serialize_xmp, xmp_exif_overrides)
                from art_tpu.settings import settings as _settings

                tags, _ = harvest(frame.filename)
                # sidecar XMP wins over in-file values (do_merge_xmp,
                # metadata.cc:463); rating and a few dc fields promote
                # into EXIF like exiv2's moveXmpToExif
                xmp_props = read_xmp_sidecar(frame.filename,
                                             _settings.xmp_sidecar_style)
                if xmp_props:
                    tags.update(xmp_exif_overrides(xmp_props))
                if pp.metadata.mode == 1:
                    if pp.metadata.exif_keys:
                        keep = set(pp.metadata.exif_keys.split(";"))
                        tags = {k: v for k, v in tags.items() if k in keep}
                    # ProcParams Exif change list (procparams.cc:4262)
                    _EXIF_FIELD = {
                        "Exif.Image.Copyright": "copyright",
                        "Exif.Image.Artist": "artist",
                        "Exif.Image.ImageDescription": "image_description",
                        "Exif.Image.Make": "make",
                        "Exif.Image.Model": "model",
                        "Exif.Photo.LensModel": "lens_model",
                        "Exif.Photo.DateTimeOriginal": "datetime_original",
                    }
                    for exiv_key, val in pp.metadata.exif.items():
                        fkey = _EXIF_FIELD.get(exiv_key)
                        if fkey:
                            tags[fkey] = val
                    if pp.metadata.iptc:
                        iptc_iim = build_iptc_iim(pp.metadata.iptc)
                if xmp_props:
                    if pp.metadata.notes:
                        xmp_props["Xmp.ART.notes"] = pp.metadata.notes
                    xmp_bytes = serialize_xmp(xmp_props)
                elif pp.metadata.notes:
                    xmp_bytes = serialize_xmp(
                        {"Xmp.ART.notes": pp.metadata.notes})
                if tags:
                    exif_bytes = build_exif_bytes(tags)
                    exif_tags = tags
            except Exception:
                pass
        icc = None
        try:
            op = _resolve_output_profile(pp.icm.output_profile)
            if op.lower().endswith((".icc", ".icm")):
                # embed the user's actual profile file
                with open(op, "rb") as f:
                    icc = f.read()
            else:
                from art_tpu.color.iccwrite import make_icc

                icc = make_icc(op)
        except Exception:
            icc = None
        save_image(output_path, out, bits=bits, quality=quality,
                   exif_bytes=exif_bytes, exif_tags=exif_tags,
                   icc_bytes=icc, uncompressed=uncompressed,
                   xmp_bytes=xmp_bytes, iptc_iim=iptc_iim,
                   subsampling=subsampling)
        if pp.metadata.mode == 0 and frame.filename:
            # tunnel mode: deep makernote copy via exiftool when the
            # binary exists (metadata.h:113 fallback; no-op otherwise)
            from art_tpu.io.exiftool import copy_tags

            copy_tags(frame.filename, output_path)
        _tick("encode+metadata", t)
    notify(listener, "save")
    return out
