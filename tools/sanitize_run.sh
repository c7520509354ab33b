#!/bin/bash
# Sanitized decode gate (the reference's WITH_SAN role,
# CMakeLists.txt:147): build the ASan+UBSan artraw and run the
# malformed-input corpus PLUS each family's valid file through the
# native harness under the sanitizers; write SAN_REPORT.json at the
# repo root. (The full pytest decode suite runs against the normal
# library in CI — ASan's interceptors make jax pipeline compiles
# impractically slow, and pixel correctness is covered there; this
# gate is the memory-safety check.)
set -u
cd "$(dirname "$0")/.."

make -C art_tpu/io/native san || exit 2

python tools/fuzz/scan_corpus.py --san --out /tmp/san_corpus.json
CORPUS_RC=$?

python - "$CORPUS_RC" <<'EOF'
import json, sys, datetime
corpus_rc = int(sys.argv[1])
corpus = json.load(open("/tmp/san_corpus.json"))
json.dump({
    "when": datetime.datetime.now().isoformat(timespec="seconds"),
    "sanitizers": "address,undefined (-fno-sanitize-recover=all)",
    "corpus": {"cases": corpus["cases"], "ok": corpus["ok"],
               "failures": corpus["failures"]},
    "note": "cases = 24 writer variants x (1 valid + ~32 bit-flips + 8 "
            "truncations); every case decodes or fails cleanly under "
            "ASan+UBSan via tools/fuzz/artraw_drive",
    "ok": corpus_rc == 0,
}, open("SAN_REPORT.json", "w"), indent=1)
print("SAN_REPORT.json ok:", corpus_rc == 0)
EOF
exit $CORPUS_RC
