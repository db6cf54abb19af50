/* Minimal config.h for the oracle build of the reference binary. */
#define VERSION "1.7-oracle"
