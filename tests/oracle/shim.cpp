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
