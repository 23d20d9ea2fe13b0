/* Differential-test wrapper around the reference's asn1c-generated
 * codec.  Built to a throwaway .so by tools/diff_asn1_ref.py; used only
 * to cross-validate dumpvdl2_tpu/proto/asn1/runtime.py, never shipped
 * or linked into the framework. */
#define _GNU_SOURCE
#include <string.h>
#include <dlfcn.h>
#include <asn_application.h>
#include <per_decoder.h>
#include <per_encoder.h>

/* Resolve any generated descriptor by ASN.1 name: the C symbol is
 * asn_DEF_<name with [-.] replaced by _>. */
static asn_TYPE_descriptor_t *lookup(const char *name) {
    char sym[256];
    snprintf(sym, sizeof sym, "asn_DEF_%s", name);
    for (char *p = sym; *p; p++)
        if (*p == '-' || *p == '.') *p = '_';
    return (asn_TYPE_descriptor_t *)dlsym(RTLD_DEFAULT, sym);
}

/* Decode `in` as `type`, re-encode, write to `out`.  Returns encoded
 * byte count, -1 on decode failure, -2 on unknown type/encode fail. */
long ref_uper_roundtrip(const char *type, const unsigned char *in,
                        long inlen, unsigned char *out, long outcap) {
    asn_TYPE_descriptor_t *td = lookup(type);
    if (!td) return -2;
    void *st = 0;
    asn_dec_rval_t rv = uper_decode_complete(0, td, &st, in, inlen);
    if (rv.code != RC_OK) {
        if (st) ASN_STRUCT_FREE(*td, st);
        return -1;
    }
    asn_enc_rval_t er = uper_encode_to_buffer(td, st, out, outcap);
    ASN_STRUCT_FREE(*td, st);
    if (er.encoded < 0) return -2;
    return (er.encoded + 7) / 8;
}

/* Decode + print (asn_fprint) into caller buffer via open_memstream. */
long ref_uper_print(const char *type, const unsigned char *in, long inlen,
                    char *out, long outcap) {
    asn_TYPE_descriptor_t *td = lookup(type);
    if (!td) return -2;
    void *st = 0;
    asn_dec_rval_t rv = uper_decode_complete(0, td, &st, in, inlen);
    if (rv.code != RC_OK) {
        if (st) ASN_STRUCT_FREE(*td, st);
        return -1;
    }
    char *buf = 0; size_t n = 0;
    FILE *f = open_memstream(&buf, &n);
    asn_fprint(f, td, st, 1);
    fclose(f);
    ASN_STRUCT_FREE(*td, st);
    long m = (long)n < outcap - 1 ? (long)n : outcap - 1;
    memcpy(out, buf, m); out[m] = 0;
    free(buf);
    return m;
}
