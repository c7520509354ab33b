"""Host I/O: raw decode, image encode/decode (reference L0 + L5, SURVEY §1)."""

from art_tpu.io.rawfile import RawFrame, load_raw, synthesize_bayer  # noqa: F401


def load_image(path):
    """Load any supported file into an image source (raw or not).

    Reference: ``InitialImage::load`` (loadinitial.cc:24-46) picks
    RawImageSource vs StdImageSource by file type.
    """
    from art_tpu.io import imagefile, rawfile

    if rawfile.is_raw_file(path):
        return rawfile.load_raw(path)
    return imagefile.load_std_image(path)
