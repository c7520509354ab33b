"""App-level Options tier (reference: ``rtgui/options.{h,cc}``).

The reference keeps three configuration tiers: engine ``Settings``
(settings.h — our :mod:`art_tpu.settings`), the app ``Options`` KeyFile
stored as ``<config dir>/options`` (options.cc:651+), and per-image
``ProcParams``. This module is the headless-relevant subset of tier 2:
default processing profiles, save-format defaults, profile/ICC/CLUT
directories, dark/flat paths, fast-export sizing and the preview
demosaic knob. GUI-only fields (window geometry, themes, panel state)
are out of scope.

Group/key names match the reference KeyFile so an existing ART
``options`` file loads as-is. ``load_options()`` also forwards the
engine-relevant values into :data:`art_tpu.settings.settings` the same
way ``Options::readFromFile`` fills ``rtSettings``.
"""

from __future__ import annotations

import dataclasses
import os

from art_tpu.params.keyfile import KeyFile

# reference defaults (options.h:101-107)
DEFPROFILE_INTERNAL = "Neutral"
DEFPROFILE_DYNAMIC = "Dynamic"
DEFPROFILE_RAW = DEFPROFILE_DYNAMIC
DEFPROFILE_IMG = DEFPROFILE_INTERNAL


@dataclasses.dataclass
class Options:
    # [General] (options.cc:720-725)
    verbose: bool = False
    dark_frames_path: str = ""
    flat_fields_path: str = ""
    # [Profiles] (options.cc:905-917)
    profile_path: str = ""           # Profiles/Directory
    use_bundled_profiles: bool = True
    def_prof_raw: str = DEFPROFILE_RAW
    def_prof_img: str = DEFPROFILE_IMG
    params_sidecar_strip_extension: bool = False
    # [Output] (options.cc:311-315, 794-840)
    format: str = "jpg"
    jpeg_quality: int = 92
    png_bits: int = 8
    tiff_bits: int = 16
    tiff_float: bool = False
    tiff_uncompressed: bool = True
    save_proc_params: bool = True
    path_template: str = ""
    use_path_template: bool = False
    # [Color Management]
    icc_directory: str = ""
    cluts_directory: str = ""        # options.cc:487 default "./cluts"
    monitor_profile: str = ""
    # [Fast Export] (options.cc:484-485)
    fast_export_resize_width: int = 1920
    fast_export_resize_height: int = 1920
    # [Performance] (options.cc:461,1123: 0=fast preview demosaic always,
    # 1=sidecar-quality demosaic when the image has an .arp)
    prev_demo: int = 1
    # [File Browser]
    max_thumbnail_height: int = 250  # MaxPreviewHeight
    parse_extensions: tuple = ()
    # [Lensfun]
    lensfun_db_directory: str = ""

    # -- KeyFile codec ------------------------------------------------------

    @classmethod
    def from_keyfile(cls, kf: KeyFile) -> "Options":
        o = cls()
        o.verbose = kf.get_bool("General", "Verbose", o.verbose)
        o.dark_frames_path = kf.get_string("General", "DarkFramesPath",
                                           o.dark_frames_path)
        o.flat_fields_path = kf.get_string("General", "FlatFieldsPath",
                                           o.flat_fields_path)
        o.profile_path = kf.get_string("Profiles", "Directory",
                                       o.profile_path)
        o.use_bundled_profiles = kf.get_bool(
            "Profiles", "UseBundledProfiles", o.use_bundled_profiles)
        o.def_prof_raw = kf.get_string("Profiles", "RawDefault",
                                       o.def_prof_raw)
        o.def_prof_img = kf.get_string("Profiles", "ImgDefault",
                                       o.def_prof_img)
        o.params_sidecar_strip_extension = kf.get_bool(
            "Profiles", "ParamsSidecarStripExtension",
            o.params_sidecar_strip_extension)
        o.format = kf.get_string("Output", "Format", o.format).lower()
        o.jpeg_quality = kf.get_int("Output", "JpegQuality",
                                    o.jpeg_quality)
        o.png_bits = kf.get_int("Output", "PngBps", o.png_bits)
        o.tiff_bits = kf.get_int("Output", "TiffBps", o.tiff_bits)
        o.tiff_float = kf.get_bool("Output", "TiffFloat", o.tiff_float)
        o.tiff_uncompressed = kf.get_bool("Output", "TiffUncompressed",
                                          o.tiff_uncompressed)
        o.save_proc_params = kf.get_bool("Output", "SaveProcParams",
                                         o.save_proc_params)
        o.path_template = kf.get_string("Output", "PathTemplate",
                                        o.path_template)
        o.use_path_template = kf.get_bool("Output", "UsePathTemplate",
                                          o.use_path_template)
        o.icc_directory = kf.get_string("Color Management", "ICCDirectory",
                                        o.icc_directory)
        o.cluts_directory = kf.get_string(
            "Color Management", "ClutsDirectory", o.cluts_directory)
        o.monitor_profile = kf.get_string(
            "Color Management", "MonitorProfile", o.monitor_profile)
        o.fast_export_resize_width = kf.get_int(
            "Fast Export", "fastexport_resize_width",
            kf.get_int("Fast Export", "MaxWidth",
                       o.fast_export_resize_width))
        o.fast_export_resize_height = kf.get_int(
            "Fast Export", "fastexport_resize_height",
            kf.get_int("Fast Export", "MaxHeight",
                       o.fast_export_resize_height))
        o.prev_demo = kf.get_int("Performance",
                                 "PreviewDemosaicFromSidecar", o.prev_demo)
        o.max_thumbnail_height = kf.get_int(
            "File Browser", "MaxPreviewHeight", o.max_thumbnail_height)
        exts = kf.get_string("File Browser", "ParseExtensions", "")
        if exts:
            o.parse_extensions = tuple(
                e.strip().lstrip(".").lower()
                for e in exts.split(";") if e.strip())
        o.lensfun_db_directory = kf.get_string(
            "Lensfun", "DBDirectory", o.lensfun_db_directory)
        return o

    def to_keyfile(self) -> KeyFile:
        kf = KeyFile()
        kf.set("General", "Verbose", self.verbose)
        if self.dark_frames_path:
            kf.set("General", "DarkFramesPath", self.dark_frames_path)
        if self.flat_fields_path:
            kf.set("General", "FlatFieldsPath", self.flat_fields_path)
        if self.profile_path:
            kf.set("Profiles", "Directory", self.profile_path)
        kf.set("Profiles", "UseBundledProfiles", self.use_bundled_profiles)
        kf.set("Profiles", "RawDefault", self.def_prof_raw)
        kf.set("Profiles", "ImgDefault", self.def_prof_img)
        kf.set("Output", "Format", self.format)
        kf.set("Output", "JpegQuality", self.jpeg_quality)
        kf.set("Output", "PngBps", self.png_bits)
        kf.set("Output", "TiffBps", self.tiff_bits)
        kf.set("Output", "TiffFloat", self.tiff_float)
        kf.set("Output", "TiffUncompressed", self.tiff_uncompressed)
        kf.set("Output", "SaveProcParams", self.save_proc_params)
        if self.path_template:
            kf.set("Output", "PathTemplate", self.path_template)
            kf.set("Output", "UsePathTemplate", self.use_path_template)
        if self.icc_directory:
            kf.set("Color Management", "ICCDirectory", self.icc_directory)
        if self.cluts_directory:
            kf.set("Color Management", "ClutsDirectory",
                   self.cluts_directory)
        kf.set("Fast Export", "fastexport_resize_width",
               self.fast_export_resize_width)
        kf.set("Fast Export", "fastexport_resize_height",
               self.fast_export_resize_height)
        kf.set("Performance", "PreviewDemosaicFromSidecar", self.prev_demo)
        kf.set("File Browser", "MaxPreviewHeight",
               self.max_thumbnail_height)
        if self.parse_extensions:
            kf.set("File Browser", "ParseExtensions",
                   ";".join(self.parse_extensions) + ";")
        if self.lensfun_db_directory:
            kf.set("Lensfun", "DBDirectory", self.lensfun_db_directory)
        return kf

    def save(self, path):
        self.to_keyfile().save(path)

    # -- settings forwarding (Options::readFromFile -> rtSettings) ----------

    def apply_to_settings(self, settings) -> None:
        if self.verbose:
            settings.verbose = True
        if self.dark_frames_path:
            settings.dark_frames_dir = self.dark_frames_path
        if self.flat_fields_path:
            settings.flat_fields_dir = self.flat_fields_path
        if self.cluts_directory:
            settings.cluts_dir = self.cluts_directory
        if self.lensfun_db_directory:
            settings.lensfun_db_dir = self.lensfun_db_directory


def config_dir() -> str:
    """User config dir (main.cc user_config_dir semantics):
    $ART_TPU_CONFIG_DIR, else $XDG_CONFIG_HOME/ART-tpu, else
    ~/.config/ART-tpu."""
    env = os.environ.get("ART_TPU_CONFIG_DIR")
    if env:
        return env
    xdg = os.environ.get("XDG_CONFIG_HOME",
                         os.path.join(os.path.expanduser("~"), ".config"))
    return os.path.join(xdg, "ART-tpu")


_options: Options | None = None


def load_options(path=None, settings=None) -> Options:
    """Load (and cache) the app options, forwarding engine-relevant
    fields into the Settings singleton. Missing file = defaults (the
    reference also starts with built-in defaults)."""
    global _options
    if path is None:
        path = os.path.join(config_dir(), "options")
    o = Options()
    if os.path.isfile(path):
        try:
            o = Options.from_keyfile(KeyFile.load(path))
        except OSError:
            pass
    if settings is None:
        from art_tpu.settings import settings as settings_
        settings = settings_
    o.apply_to_settings(settings)
    _options = o
    return o


def get_options() -> Options:
    """The cached app options (defaults if load_options never ran)."""
    global _options
    if _options is None:
        _options = Options()
    return _options
