// Minimal crash harness for libartraw: decode one file per argv entry
// in-process. Exit 0 = every input either decoded or returned NULL;
// any signal/abort (incl. sanitizer reports when built against
// libartraw_san.so) = harness failure. Used by tools/sanitize_run.sh
// and tests/test_malformed.py's scan mode.
//
// Build: g++ -O1 -g -std=c++17 -o artraw_drive artraw_drive.cc -ldl
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <dlfcn.h>

struct ArtRawMeta {  // opaque stand-in, oversized (real struct ~640 B)
    alignas(8) unsigned char bytes[4096];
};

int main(int argc, char** argv) {
    if (argc < 3) {
        fprintf(stderr, "usage: %s libartraw.so file...\n", argv[0]);
        return 2;
    }
    void* h = dlopen(argv[1], RTLD_NOW);
    if (!h) { fprintf(stderr, "dlopen: %s\n", dlerror()); return 2; }
    typedef unsigned short* (*decode_t)(const char*, size_t, void*);
    typedef void (*free_t)(unsigned short*);
    decode_t decode = (decode_t)dlsym(h, "artraw_decode_dng");
    free_t freefn = (free_t)dlsym(h, "artraw_free");
    if (!decode || !freefn) { fprintf(stderr, "dlsym failed\n"); return 2; }
    for (int i = 2; i < argc; ++i) {
        FILE* f = fopen(argv[i], "rb");
        if (!f) continue;
        fseek(f, 0, SEEK_END);
        long n = ftell(f);
        fseek(f, 0, SEEK_SET);
        char* buf = (char*)malloc(n > 0 ? n : 1);
        if (fread(buf, 1, n, f) != (size_t)n) { fclose(f); free(buf); continue; }
        fclose(f);
        ArtRawMeta meta;
        memset(&meta, 0, sizeof meta);
        unsigned short* img = decode(buf, (size_t)n, &meta);
        if (img) freefn(img);
        free(buf);
    }
    return 0;
}
