"""exiftool fallback tests (stub binary — exiftool isn't in the image)."""

import os
import stat

from art_tpu.io.exiftool import copy_tags, find_exiftool


def _stub(tmp_path, rc=0):
    p = os.path.join(tmp_path, "exiftool")
    log = os.path.join(tmp_path, "argv.log")
    with open(p, "w") as f:
        f.write(f'#!/bin/sh\necho "$@" > {log}\nexit {rc}\n')
    os.chmod(p, os.stat(p).st_mode | stat.S_IEXEC)
    return p, log


def test_find_missing_returns_none():
    assert find_exiftool("/nonexistent/exiftool") is None
    assert find_exiftool("") is None


def test_copy_tags_invokes_binary(tmp_path):
    exe, log = _stub(str(tmp_path))
    src = os.path.join(str(tmp_path), "in.dng")
    dst = os.path.join(str(tmp_path), "out.jpg")
    open(src, "w").close()
    open(dst, "w").close()
    assert copy_tags(src, dst, exiftool=exe)
    argv = open(log).read()
    assert "-TagsFromFile" in argv and src in argv and dst in argv
    assert "--Orientation" in argv  # rotation is baked into pixels


def test_copy_tags_failure_is_soft(tmp_path):
    exe, _ = _stub(str(tmp_path), rc=1)
    assert not copy_tags("a", "b", exiftool=exe)
    assert not copy_tags("a", "b", exiftool="/missing/exiftool2")
