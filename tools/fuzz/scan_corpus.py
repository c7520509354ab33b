"""Drive the malformed-input corpus through artraw via the native
harness (tools/fuzz/artraw_drive), one subprocess per case so a crash
or sanitizer abort is isolated and attributed.

Usage: python tools/fuzz/scan_corpus.py [--san] [--out REPORT.json]
--san uses libartraw_san.so under LD_PRELOADed libasan (builds both on
demand). Exit 0 iff every case is clean.
"""
import json
import os
import pathlib
import subprocess
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    san = "--san" in sys.argv
    outp = None
    if "--out" in sys.argv:
        outp = sys.argv[sys.argv.index("--out") + 1]

    from test_malformed import WRITERS

    native = os.path.join(ROOT, "art_tpu", "io", "native")
    drive = os.path.join(ROOT, "tools", "fuzz", "artraw_drive")
    if not os.path.exists(drive):
        subprocess.run(["g++", "-O1", "-g", "-std=c++17", "-o", drive,
                        drive + ".cc", "-ldl"], check=True)
    if san:
        subprocess.run(["make", "-C", native, "san"], check=True,
                       capture_output=True)
        so = os.path.join(native, "libartraw_san.so")
        asan = subprocess.run(["g++", "-print-file-name=libasan.so"],
                              capture_output=True, text=True).stdout.strip()
        env = dict(os.environ, LD_PRELOAD=asan,
                   ASAN_OPTIONS="detect_leaks=0")
    else:
        subprocess.run(["make", "-C", native], check=True,
                       capture_output=True)
        so = os.path.join(native, "libartraw.so")
        env = dict(os.environ)

    failures = []
    n_cases = 0
    for fam in sorted(WRITERS):
        td = pathlib.Path(tempfile.mkdtemp(prefix=f"corpus_{fam}_"))
        src = td / f"whole.{fam.split('_')[0]}"
        WRITERS[fam](src)
        data = bytearray(src.read_bytes())
        n = len(data)
        positions = list(range(0, min(256, n), 8))
        positions += [min(n - 1, 256 + (n - 256) * k // 16)
                      for k in range(16)]
        cases = [("valid", 0)]  # the unmodified file: happy-path decode
        cases += [("flip", pos) for pos in sorted(set(positions))]
        cases += [("trunc", max(1, int(n * f)))
                  for f in (0.01, 0.05, 0.15, 0.3, 0.5, 0.7, 0.9, 0.99)]
        # batch clean-running cases per family would hide attribution;
        # one subprocess per case keeps it exact and is still fast
        for kind, pos in cases:
            if kind == "flip":
                orig = data[pos]
                data[pos] ^= 0xFF
                blob = bytes(data)
                data[pos] = orig
            elif kind == "trunc":
                blob = bytes(data[:pos])
            else:
                blob = bytes(data)
            p = td / "case.bin"
            p.write_bytes(blob)
            n_cases += 1
            try:
                r = subprocess.run([drive, so, str(p)],
                                   capture_output=True, timeout=60,
                                   env=env)
                rc = r.returncode
                err = r.stderr.decode(errors="replace")[-400:]
            except subprocess.TimeoutExpired:
                rc, err = -99, "timeout"
            if rc != 0:
                keep = td / f"crash_{kind}_{pos}.bin"
                keep.write_bytes(blob)
                failures.append({"family": fam, "kind": kind, "pos": pos,
                                 "rc": rc, "file": str(keep),
                                 "stderr_tail": err})
                print(f"FAIL {fam} {kind}@{pos} rc={rc}", flush=True)
    report = {"sanitized": san, "cases": n_cases,
              "failures": failures, "ok": not failures}
    print(json.dumps({k: report[k] for k in ("sanitized", "cases", "ok")}))
    if outp:
        with open(outp, "w") as f:
            json.dump(report, f, indent=1)
    return 0 if not failures else 1


if __name__ == "__main__":
    sys.exit(main())
