/* Shim header standing in for libdivsufsort64 when building the reference
 * binary as a TEST ORACLE.  The implementation is this repo's own SA-IS
 * (phylonium_tpu/native/src/phylonium_native.cpp), which produces the same
 * byte-lexicographic suffix order. */
#pragma once
#include <stdint.h>
typedef int64_t saidx64_t;
#ifdef __cplusplus
extern "C" {
#endif
int32_t divsufsort64(const unsigned char *T, saidx64_t *SA, saidx64_t n);
#ifdef __cplusplus
}
#endif
