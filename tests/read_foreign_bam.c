/* Independent strict BAM reader (VERDICT r4 missing #2: write-side interop).
 *
 * Parses a BAM file using its OWN BGZF + record decoder built directly on
 * zlib — zero code shared with the framework's io/sam.py codec — so running
 * it over io/sam.py-WRITTEN output closes the interop loop in the direction
 * tests/make_foreign_bam.c cannot: the reference pipes its filter output
 * into samtools (Snakefile:90-92), i.e. a foreign reader must accept what
 * we write.
 *
 * Strictness (any violation => nonzero exit + message on stderr):
 *   - every BGZF block: gzip magic 1f 8b 08 04, FEXTRA with a BC subfield,
 *     BSIZE consistent with the block actually read, raw-deflate payload
 *     whose CRC32 and ISIZE trailers verify;
 *   - the file ends with the exact 28-byte BGZF EOF marker;
 *   - BAM magic, header text length, reference dictionary in bounds;
 *   - every record's variable-length sections (qname NUL-terminated,
 *     CIGAR, packed seq, qual, aux) sum EXACTLY to block_size; aux tags
 *     decode to completion (types A c C s S i I f Z H B).
 *
 * Output: one SAM-style line per record on stdout —
 *   QNAME FLAG RNAME POS MAPQ CIGAR RNEXT PNEXT TLEN SEQ QUAL TAG:TYPE:VAL...
 * (B-array tags as TAG:B:<sub>,v1,v2,...; all integer aux types print as
 * TAG:i:<val> like samtools view).
 *
 *   gcc -O2 -o read_foreign_bam tests/read_foreign_bam.c -lz
 *   ./read_foreign_bam file.bam
 */
#include <inttypes.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <zlib.h>

static void die(const char *msg)
{
    fprintf(stderr, "read_foreign_bam: %s\n", msg);
    exit(1);
}

/* ------------------------------------------------------------- BGZF layer */

static const uint8_t BGZF_EOF[28] = {
    0x1f, 0x8b, 0x08, 0x04, 0, 0, 0, 0, 0, 0xff, 0x06, 0x00,
    0x42, 0x43, 0x02, 0x00, 0x1b, 0x00, 0x03, 0x00, 0, 0, 0, 0,
    0, 0, 0, 0};

/* inflate the whole BGZF file into one buffer, validating every block */
static uint8_t *bgzf_read_all(const char *path, size_t *out_n)
{
    FILE *f = fopen(path, "rb");
    if (!f) { perror(path); exit(1); }
    if (fseek(f, 0, SEEK_END)) die("seek failed");
    long fsz = ftell(f);
    if (fsz < 28) die("file shorter than the BGZF EOF marker");
    uint8_t *raw = (uint8_t *)malloc((size_t)fsz);
    if (!raw) die("oom");
    rewind(f);
    if (fread(raw, 1, (size_t)fsz, f) != (size_t)fsz) die("short read");
    fclose(f);

    if (memcmp(raw + fsz - 28, BGZF_EOF, 28) != 0)
        die("missing/incorrect 28-byte BGZF EOF marker at end of file");

    size_t cap = 1 << 20, n = 0;
    uint8_t *out = (uint8_t *)malloc(cap);
    if (!out) die("oom");

    size_t p = 0;
    while (p < (size_t)fsz) {
        if (p + 18 > (size_t)fsz) die("truncated BGZF block header");
        const uint8_t *h = raw + p;
        if (!(h[0] == 0x1f && h[1] == 0x8b && h[2] == 8))
            die("bad gzip magic in BGZF block");
        if (!(h[3] & 4)) die("BGZF block missing FEXTRA flag");
        uint16_t xlen;
        memcpy(&xlen, h + 10, 2);
        if (p + 12 + xlen > (size_t)fsz) die("FEXTRA overruns file");
        /* scan extra subfields for BC */
        int bsize = -1;
        size_t q = p + 12, xend = p + 12 + xlen;
        while (q + 4 <= xend) {
            uint8_t si1 = raw[q], si2 = raw[q + 1];
            uint16_t slen;
            memcpy(&slen, raw + q + 2, 2);
            if (q + 4 + slen > xend) die("extra subfield overruns XLEN");
            if (si1 == 'B' && si2 == 'C') {
                if (slen != 2) die("BC subfield SLEN != 2");
                uint16_t bs16;
                memcpy(&bs16, raw + q + 4, 2);
                bsize = (int)bs16 + 1;
            }
            q += 4 + (size_t)slen;
        }
        if (bsize < 0) die("BGZF block has no BC subfield (not BGZF)");
        if (p + (size_t)bsize > (size_t)fsz) die("BSIZE overruns file");
        size_t cdata_off = p + 12 + xlen;
        size_t cdata_len = (size_t)bsize - 12 - xlen - 8;
        uint32_t crc_want, isize;
        memcpy(&crc_want, raw + p + (size_t)bsize - 8, 4);
        memcpy(&isize, raw + p + (size_t)bsize - 4, 4);
        if (isize > (1u << 16))
            die("BGZF ISIZE exceeds the 64 KiB block limit");

        while (n + isize > cap) {
            cap *= 2;
            out = (uint8_t *)realloc(out, cap);
            if (!out) die("oom");
        }
        z_stream zs;
        memset(&zs, 0, sizeof(zs));
        if (inflateInit2(&zs, -15) != Z_OK) die("inflateInit2 failed");
        zs.next_in = raw + cdata_off;
        zs.avail_in = (uInt)cdata_len;
        zs.next_out = out + n;
        zs.avail_out = isize;
        int zr = inflate(&zs, Z_FINISH);
        if (zr != Z_STREAM_END) die("BGZF block payload fails to inflate");
        if (zs.total_out != isize) die("inflated size != ISIZE trailer");
        inflateEnd(&zs);
        if (crc32(0L, out + n, isize) != crc_want)
            die("BGZF block CRC32 mismatch");
        n += isize;
        p += (size_t)bsize;
    }
    free(raw);
    *out_n = n;
    return out;
}

/* -------------------------------------------------------------- BAM layer */

static size_t POS = 0, LEN = 0;
static const uint8_t *BUF;

static void need(size_t n, const char *what)
{
    if (POS + n > LEN) {
        fprintf(stderr, "read_foreign_bam: truncated %s\n", what);
        exit(1);
    }
}

static int32_t get_i32(const char *what)
{
    int32_t v;
    need(4, what);
    memcpy(&v, BUF + POS, 4);
    POS += 4;
    return v;
}

static const char SEQ16[] = "=ACMGRSVTWYHKDBN";
static const char *CIGCH = "MIDNSHP=X";

int main(int argc, char **argv)
{
    if (argc != 2) { fprintf(stderr, "usage: %s file.bam\n", argv[0]); return 2; }
    size_t n;
    BUF = bgzf_read_all(argv[1], &n);
    LEN = n;

    need(4, "BAM magic");
    if (memcmp(BUF, "BAM\1", 4)) die("bad BAM magic");
    POS = 4;
    int32_t l_text = get_i32("l_text");
    if (l_text < 0) die("negative l_text");
    need((size_t)l_text, "header text");
    POS += (size_t)l_text;
    int32_t n_ref = get_i32("n_ref");
    if (n_ref < 0) die("negative n_ref");
    char **refs = (char **)calloc((size_t)n_ref, sizeof(char *));
    for (int32_t i = 0; i < n_ref; ++i) {
        int32_t l_name = get_i32("ref l_name");
        if (l_name <= 0) die("ref l_name <= 0");
        need((size_t)l_name, "ref name");
        if (BUF[POS + l_name - 1] != 0) die("ref name not NUL-terminated");
        refs[i] = (char *)malloc((size_t)l_name);
        memcpy(refs[i], BUF + POS, (size_t)l_name);
        POS += (size_t)l_name;
        int32_t l_ref = get_i32("ref l_ref");
        if (l_ref < 0) die("negative ref length");
    }

    long n_rec = 0;
    while (POS < LEN) {
        int32_t block = get_i32("record block_size");
        if (block < 32) die("record block_size < fixed section");
        need((size_t)block, "record body");
        size_t end = POS + (size_t)block;

        int32_t tid = get_i32("tid");
        int32_t pos0 = get_i32("pos");
        need(4, "len/mapq/bin");
        uint8_t l_qname = BUF[POS];
        uint8_t mapq = BUF[POS + 1];
        POS += 4;                              /* l_qname, mapq, bin */
        need(4, "n_cigar/flag");
        uint16_t n_cig, flag;
        memcpy(&n_cig, BUF + POS, 2);
        memcpy(&flag, BUF + POS + 2, 2);
        POS += 4;
        int32_t l_seq = get_i32("l_seq");
        int32_t mtid = get_i32("mtid");
        int32_t mpos0 = get_i32("mpos");
        int32_t tlen = get_i32("tlen");
        if (l_qname == 0) die("l_read_name == 0");
        need(l_qname, "qname");
        if (BUF[POS + l_qname - 1] != 0) die("qname not NUL-terminated");
        if (tid < -1 || tid >= n_ref) die("tid out of range");
        if (mtid < -1 || mtid >= n_ref) die("mtid out of range");
        if (l_seq < 0) die("negative l_seq");
        printf("%s\t%u\t%s\t%d\t%u\t", (const char *)(BUF + POS), flag,
               tid < 0 ? "*" : refs[tid], pos0 + 1, mapq);
        POS += l_qname;

        if (n_cig == 0) {
            printf("*\t");
        } else {
            need(4u * n_cig, "cigar");
            /* query length from CIGAR must match l_seq when seq present */
            int64_t qlen = 0;
            for (uint16_t i = 0; i < n_cig; ++i) {
                uint32_t c;
                memcpy(&c, BUF + POS + 4u * i, 4);
                uint32_t op = c & 0xF, ln = c >> 4;
                if (op > 8) die("CIGAR op > 8");
                if (op == 0 || op == 1 || op == 4 || op == 7 || op == 8)
                    qlen += ln;
                printf("%u%c", ln, CIGCH[op]);
            }
            if (l_seq > 0 && qlen != l_seq)
                die("CIGAR query length != l_seq");
            POS += 4u * n_cig;
            printf("\t");
        }
        printf("%s\t%d\t%d\t", mtid < 0 ? "*" : refs[mtid], mpos0 + 1, tlen);

        size_t nb = ((size_t)l_seq + 1) / 2;
        need(nb + (size_t)l_seq, "seq/qual");
        if (l_seq == 0) {
            printf("*\t*");
        } else {
            for (int32_t i = 0; i < l_seq; ++i) {
                uint8_t b = BUF[POS + (size_t)i / 2];
                putchar(SEQ16[(i % 2) ? (b & 0xF) : (b >> 4)]);
            }
            putchar('\t');
            if (BUF[POS + nb] == 0xFF) {
                putchar('*');
            } else {
                for (int32_t i = 0; i < l_seq; ++i)
                    putchar((char)(BUF[POS + nb + (size_t)i] + 33));
            }
        }
        POS += nb + (size_t)l_seq;

        /* aux tags to the exact end of the record */
        while (POS < end) {
            need(3, "aux tag header");
            char t0 = (char)BUF[POS], t1 = (char)BUF[POS + 1];
            char ty = (char)BUF[POS + 2];
            POS += 3;
            printf("\t%c%c:", t0, t1);
            int64_t iv = 0;
            float fv = 0;
            switch (ty) {
            case 'A':
                need(1, "aux A");
                printf("A:%c", (char)BUF[POS]);
                POS += 1;
                break;
            case 'c': need(1, "aux c"); iv = (int8_t)BUF[POS]; POS += 1;
                printf("i:%" PRId64, iv); break;
            case 'C': need(1, "aux C"); iv = BUF[POS]; POS += 1;
                printf("i:%" PRId64, iv); break;
            case 's': need(2, "aux s"); { int16_t v; memcpy(&v, BUF + POS, 2);
                iv = v; } POS += 2; printf("i:%" PRId64, iv); break;
            case 'S': need(2, "aux S"); { uint16_t v; memcpy(&v, BUF + POS, 2);
                iv = v; } POS += 2; printf("i:%" PRId64, iv); break;
            case 'i': need(4, "aux i"); { int32_t v; memcpy(&v, BUF + POS, 4);
                iv = v; } POS += 4; printf("i:%" PRId64, iv); break;
            case 'I': need(4, "aux I"); { uint32_t v; memcpy(&v, BUF + POS, 4);
                iv = v; } POS += 4; printf("i:%" PRId64, iv); break;
            case 'f': need(4, "aux f"); memcpy(&fv, BUF + POS, 4); POS += 4;
                printf("f:%g", fv); break;
            case 'Z': case 'H': {
                size_t z = POS;
                while (z < end && BUF[z]) ++z;
                if (z >= end) die("unterminated Z/H aux value");
                printf("%c:%s", ty, (const char *)(BUF + POS));
                POS = z + 1;
                break;
            }
            case 'B': {
                need(5, "aux B header");
                char sub = (char)BUF[POS];
                int32_t cnt;
                memcpy(&cnt, BUF + POS + 1, 4);
                POS += 5;
                if (cnt < 0) die("negative B-array count");
                size_t esz = (sub == 'c' || sub == 'C') ? 1 :
                             (sub == 's' || sub == 'S') ? 2 :
                             (sub == 'i' || sub == 'I' || sub == 'f') ? 4 : 0;
                if (!esz) die("unknown B-array subtype");
                need(esz * (size_t)cnt, "aux B data");
                printf("B:%c", sub);
                for (int32_t i = 0; i < cnt; ++i) {
                    const uint8_t *e = BUF + POS + esz * (size_t)i;
                    int64_t v = 0;
                    float fvv = 0;
                    switch (sub) {
                    case 'c': v = (int8_t)e[0]; break;
                    case 'C': v = e[0]; break;
                    case 's': { int16_t x; memcpy(&x, e, 2); v = x; } break;
                    case 'S': { uint16_t x; memcpy(&x, e, 2); v = x; } break;
                    case 'i': { int32_t x; memcpy(&x, e, 4); v = x; } break;
                    case 'I': { uint32_t x; memcpy(&x, e, 4); v = x; } break;
                    case 'f': memcpy(&fvv, e, 4); break;
                    }
                    if (sub == 'f') printf(",%g", fvv);
                    else printf(",%" PRId64, v);
                }
                POS += esz * (size_t)cnt;
                break;
            }
            default:
                fprintf(stderr, "read_foreign_bam: unknown aux type '%c'\n",
                        ty);
                return 1;
            }
        }
        if (POS != end) die("aux section overran record block_size");
        putchar('\n');
        ++n_rec;
    }
    fprintf(stderr, "read_foreign_bam: ok, %ld records\n", n_rec);
    return 0;
}
