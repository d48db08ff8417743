// binfmt_tool — native inspector/validator for rwkv .bin checkpoints.
//
// The C++ side of the checkpoint pipeline (the reference's counterpart is
// the libtorch serializer converter/cpp_save_tensor.cpp + the engine loader
// rwkv.cu:638-717). This tool re-derives the same 46-tensor registry layout
// (names/dtypes/size formulas mirrored from rwkv_tpu/io/registry.py) and:
//
//   binfmt_tool info  model.bin   — header + per-tensor offset/size table
//   binfmt_tool verify model.bin  — structural validation: header sanity,
//                                   exact file length, finite f32/f64
//                                   payloads in the model tensors
//
// Build: make -C native binfmt_tool

#include <cinttypes>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

constexpr int64_t V = 50277;  // NeoX vocab, hardcoded in the format

struct Spec {
    const char* name;
    char dtype;  // 'd' f64, 'f' f32, 'b' u8
    int64_t numel;  // filled per model dims
    bool scratch;   // converter writes garbage here; skip content checks
};

std::vector<Spec> registry(int64_t a, int64_t b) {
    auto E = b;
    return {
        {"xbuf", 'd', E, true},
        {"embed", 'f', V * E, false},
        {"layernorms", 'd', 4 * (a + 1) * E, false},
        {"state_xy", 'd', a * E, false},
        {"state_aa", 'd', a * E, false},
        {"state_bb", 'd', a * E, false},
        {"state_pp", 'd', a * E, false},
        {"state_dd", 'd', a * E, false},
        {"buffer1", 'd', E, true},
        {"buffer2", 'f', V, true},
        {"buffer3", 'f', E, true},
        {"buffer4", 'f', E, true},
        {"mix_k", 'd', a * E, false},
        {"mix_v", 'd', a * E, false},
        {"mix_r", 'd', a * E, false},
        {"km", 'b', a * E * E, false},
        {"vm", 'b', a * E * E, false},
        {"rm", 'b', a * E * E, false},
        {"kr", 'f', a * E, false},
        {"vr", 'f', a * E, false},
        {"rr", 'f', a * E, false},
        {"o1", 'f', a * E, false},
        {"o2", 'f', a * E, false},
        {"o3", 'f', a * E, false},
        {"att_out", 'b', a * E * E, false},
        {"att_out_r", 'f', a * E, false},
        {"att_out_o", 'f', a * E, false},
        {"ffn_mix_k", 'd', a * E, false},
        {"ffn_mix_v", 'd', a * E, false},
        {"ffn_k", 'b', a * E * E * 4, false},
        {"ffn_v", 'b', a * E * E * 4, false},
        {"ffn_r", 'b', a * E * E, false},
        {"ffn_kr", 'f', a * E, false},
        {"ffn_vr", 'f', a * E * 4, false},
        {"ffn_rr", 'f', a * E, false},
        {"ffn_ko", 'f', a * E, false},
        {"ffn_vo", 'f', a * E * 4, false},
        {"ffn_ro", 'f', a * E, false},
        {"ffn_k_buffer", 'd', E, true},
        {"ffn_v_buffer", 'd', E, true},
        {"ffn_r_buffer", 'f', 4 * E, true},
        {"decay", 'd', a * E, false},
        {"bonus", 'd', a * E, false},
        {"head", 'b', V * E, false},
        {"head_r", 'f', E, false},
        {"head_o", 'f', E, false},
    };
}

int64_t itemsize(char d) { return d == 'd' ? 8 : d == 'f' ? 4 : 1; }

bool check_finite(FILE* f, const Spec& s, int64_t offset) {
    if (s.scratch || s.dtype == 'b') return true;
    // sample up to 1M elements evenly
    const int64_t sample = std::min<int64_t>(s.numel, 1 << 20);
    const int64_t stride = s.numel / sample;
    std::vector<unsigned char> buf(static_cast<size_t>(itemsize(s.dtype)));
    for (int64_t i = 0; i < sample; ++i) {
        int64_t idx = i * stride;
        if (fseeko(f, offset + idx * itemsize(s.dtype), SEEK_SET)) return false;
        if (fread(buf.data(), buf.size(), 1, f) != 1) return false;
        double v;
        if (s.dtype == 'd') {
            double d;
            std::memcpy(&d, buf.data(), 8);
            v = d;
        } else {
            float fl;
            std::memcpy(&fl, buf.data(), 4);
            v = fl;
        }
        if (std::isnan(v) || std::isinf(v)) {
            // state_pp legitimately holds -1e30 (not inf); anything
            // non-finite is corruption
            std::fprintf(stderr, "  %s: non-finite value at element %" PRId64 "\n",
                         s.name, idx);
            return false;
        }
    }
    return true;
}

}  // namespace

int main(int argc, char** argv) {
    if (argc < 3 ||
        (std::strcmp(argv[1], "info") && std::strcmp(argv[1], "verify"))) {
        std::fprintf(stderr, "usage: %s info|verify model.bin\n", argv[0]);
        return 2;
    }
    const bool verify = !std::strcmp(argv[1], "verify");
    FILE* f = std::fopen(argv[2], "rb");
    if (!f) {
        std::perror("open");
        return 1;
    }
    int64_t hdr[2];
    if (fread(hdr, sizeof(hdr), 1, f) != 1) {
        std::fprintf(stderr, "error: short read on header\n");
        return 1;
    }
    int64_t L = hdr[0], E = hdr[1];
    if (L <= 0 || L > 1024 || E <= 0 || E > (1 << 20)) {
        std::fprintf(stderr, "error: implausible header L=%" PRId64 " E=%" PRId64 "\n",
                     L, E);
        return 1;
    }
    std::printf("rwkv .bin: n_layer=%" PRId64 " n_embd=%" PRId64 "\n", L, E);

    auto regs = registry(L, E);
    int64_t off = 16;
    bool ok = true;
    for (auto& s : regs) {
        int64_t nbytes = s.numel * itemsize(s.dtype);
        if (!verify)
            std::printf("  %-14s %c  off=%-14" PRId64 " bytes=%" PRId64 "\n",
                        s.name, s.dtype, off, nbytes);
        else if (!check_finite(f, s, off))
            ok = false;
        off += nbytes;
    }
    fseeko(f, 0, SEEK_END);
    int64_t actual = ftello(f);
    std::printf("expected file size: %" PRId64 "  actual: %" PRId64 "  %s\n",
                off, actual, off == actual ? "OK" : "MISMATCH");
    if (off != actual) ok = false;
    if (verify)
        std::printf("verify: %s\n", ok ? "PASS" : "FAIL");
    std::fclose(f);
    return ok ? 0 : 1;
}
