// divsufsort64 shim backed by this repo's SA-IS (see native/__init__.py).
#include "divsufsort64.h"
#include <cstdint>
#include <cstring>
extern "C" void phy_build_sa(const uint8_t *s, int64_t n, int64_t *out);
extern "C" int32_t divsufsort64(const unsigned char *T, saidx64_t *SA,
                                saidx64_t n) {
    phy_build_sa(reinterpret_cast<const uint8_t *>(T), n, SA);
    return 0;
}

// Deterministic std::random_device for bootstrap byte-parity tests.
//
// The reference seeds its global mt19937 from std::random_device
// (src/phylonium.cxx:76-91), so `-b` replicates are never reproducible.
// With PHYLONIUM_ORACLE_RD_SEED=<u32> set, this interposed _M_getval
// (the out-of-line entropy fetch every random_device draw funnels
// through in libstdc++) replays a splitmix32 word stream instead —
// the same stream phylonium_tpu/model/glibcxx_prng.py feeds our side
// under PHYLONIUM_TPU_RD_SEED, making `-b` output byte-comparable.
// Unset, it reads /dev/urandom like the real thing.
#include <cstdio>
#include <cstdlib>
#include <random>

static bool phy_rd_seeded = false;
static bool phy_rd_checked = false;
static uint32_t phy_rd_state = 0;

namespace std {
random_device::result_type random_device::_M_getval() {
    if (!phy_rd_checked) {
        phy_rd_checked = true;
        if (const char *s = getenv("PHYLONIUM_ORACLE_RD_SEED")) {
            phy_rd_seeded = true;
            phy_rd_state = (uint32_t)strtoul(s, nullptr, 10);
        }
    }
    if (phy_rd_seeded) {
        phy_rd_state += 0x9E3779B9u;
        uint32_t z = phy_rd_state;
        z ^= z >> 16; z *= 0x21F0AAADu;
        z ^= z >> 15; z *= 0x735A2D97u;
        z ^= z >> 15;
        return z;
    }
    unsigned int v;
    FILE *f = fopen("/dev/urandom", "rb");
    if (!f || fread(&v, sizeof v, 1, f) != 1) abort();
    fclose(f);
    return v;
}
} // namespace std
