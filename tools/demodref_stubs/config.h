/* TEST-ONLY fake config.h for the compiled demod oracle
 * (tools/build_demodref.sh).  Linux/glibc feature selections. */
#ifndef _FAKE_CONFIG_H
#define _FAKE_CONFIG_H
#define HAVE_PTHREAD_BARRIERS 1
#define SINCOSF sincosf
#endif
