/* Oracle harness for the _KhashLayout simulator (bgt_tpu/formats/csi.py):
 * reads a put sequence of uint32 keys (one per line) on stdin, performs
 * the same kh_put calls against the REFERENCE's khash.h (built from
 * /root/reference like the bgt oracle binary), and prints the occupied
 * keys in bucket-iteration order — exactly what hts_idx_save_core
 * iterates when writing a .csi.  Used by tests/test_formats.py's
 * layout fuzz test. */
#include <stdio.h>
#include <stdlib.h>
#include "khash.h"

KHASH_MAP_INIT_INT(bin, int)

int main(void) {
    khash_t(bin) *h = kh_init(bin);
    char line[64];
    while (fgets(line, sizeof line, stdin)) {
        unsigned long key = strtoul(line, NULL, 10);
        int absent;
        kh_put(bin, h, (khint32_t)key, &absent);
    }
    for (khint_t k = kh_begin(h); k != kh_end(h); ++k)
        if (kh_exist(h, k)) printf("%u\n", kh_key(h, k));
    kh_destroy(bin, h);
    return 0;
}
