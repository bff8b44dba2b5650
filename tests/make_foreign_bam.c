/* Foreign-writer BAM fixture generator (VERDICT r3 item 5).
 *
 * Emits tests/golden/foreign/foreign.bam using its OWN BGZF + BAM record
 * encoder built directly on zlib — zero code shared with the framework's
 * io/sam.py codec — so parsing it exercises real cross-tool interop, the
 * way the reference consumes samtools/minimap2 output (Snakefile:62,90-92).
 *
 * Layout follows the SAM/BAM spec (htslib SAMv1.pdf): one BGZF block
 * holding the whole payload (header + 5 records), then the 28-byte BGZF
 * EOF marker.
 *
 *   gcc -O2 -o make_foreign_bam tests/make_foreign_bam.c -lz
 *   ./make_foreign_bam tests/golden/foreign/foreign.bam
 */
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <zlib.h>

static uint8_t payload[1 << 16];
static size_t plen = 0;

static void put(const void *p, size_t n) { memcpy(payload + plen, p, n); plen += n; }
static void put_u8(uint8_t v) { put(&v, 1); }
static void put_u16(uint16_t v) { put(&v, 2); }
static void put_u32(uint32_t v) { put(&v, 4); }
static void put_i32(int32_t v) { put(&v, 4); }

/* 4-bit base codes: =ACMGRSVTWYHKDBN */
static uint8_t base4(char c)
{
    switch (c) {
        case 'A': return 1; case 'C': return 2; case 'G': return 4;
        case 'T': return 8; default: return 15;
    }
}

struct auxi { char tag[2]; char type; int32_t i; char a; };

static void put_record(int32_t tid, int32_t pos0, uint16_t flag, uint8_t mapq,
                       const char *qname, const uint32_t *cigar, int n_cigar,
                       const char *seq, const char *qual,
                       int32_t mtid, int32_t mpos0, int32_t tlen,
                       const struct auxi *aux, int n_aux)
{
    int l_qname = (int)strlen(qname) + 1;
    int l_seq = (int)strlen(seq);
    size_t start = plen;
    put_u32(0);                       /* block_size placeholder */
    put_i32(tid);
    put_i32(pos0);
    put_u8((uint8_t)l_qname);
    put_u8(mapq);
    put_u16(0);                       /* bin: unused by consumers here */
    put_u16((uint16_t)n_cigar);
    put_u16(flag);
    put_u32((uint32_t)l_seq);
    put_i32(mtid);
    put_i32(mpos0);
    put_i32(tlen);
    put(qname, l_qname);
    put(cigar, 4 * (size_t)n_cigar);
    for (int i = 0; i < l_seq; i += 2) {
        uint8_t hi = base4(seq[i]);
        uint8_t lo = (i + 1 < l_seq) ? base4(seq[i + 1]) : 0;
        put_u8((uint8_t)((hi << 4) | lo));
    }
    for (int i = 0; i < l_seq; ++i)
        put_u8(qual ? (uint8_t)(qual[i] - 33) : 0xFF);
    for (int i = 0; i < n_aux; ++i) {
        put(aux[i].tag, 2);
        put_u8((uint8_t)aux[i].type);
        if (aux[i].type == 'i') put_i32(aux[i].i);
        else put_u8((uint8_t)aux[i].a);
    }
    uint32_t bs = (uint32_t)(plen - start - 4);
    memcpy(payload + start, &bs, 4);
}

static void write_bgzf_block(FILE *f, const uint8_t *data, size_t n)
{
    uint8_t comp[1 << 16];
    z_stream zs;
    memset(&zs, 0, sizeof(zs));
    /* raw deflate (windowBits=-15): BGZF wraps it in its own gzip frame */
    if (deflateInit2(&zs, Z_DEFAULT_COMPRESSION, Z_DEFLATED, -15, 8,
                     Z_DEFAULT_STRATEGY) != Z_OK) { fprintf(stderr, "zlib\n"); exit(1); }
    zs.next_in = (uint8_t *)data; zs.avail_in = (uInt)n;
    zs.next_out = comp; zs.avail_out = sizeof(comp);
    if (deflate(&zs, Z_FINISH) != Z_STREAM_END) { fprintf(stderr, "deflate\n"); exit(1); }
    size_t clen = zs.total_out;
    deflateEnd(&zs);

    uint16_t bsize = (uint16_t)(clen + 25);   /* total block length - 1 */
    uint8_t hdr[18] = {0x1f, 0x8b, 8, 4, 0, 0, 0, 0, 0, 0xff,
                       6, 0, 'B', 'C', 2, 0,
                       (uint8_t)(bsize & 0xff), (uint8_t)(bsize >> 8)};
    uint32_t crc = crc32(0L, data, (uInt)n);
    uint32_t isize = (uint32_t)n;
    fwrite(hdr, 1, 18, f);
    fwrite(comp, 1, clen, f);
    fwrite(&crc, 4, 1, f);
    fwrite(&isize, 4, 1, f);
}

int main(int argc, char **argv)
{
    const char *out = argc > 1 ? argv[1] : "foreign.bam";

    const char *text = "@HD\tVN:1.6\tSO:coordinate\n"
                       "@SQ\tSN:chrF1\tLN:100000\n"
                       "@SQ\tSN:chrF2\tLN:50000\n"
                       "@PG\tID:foreignwriter\tPN:foreignwriter\n";
    put("BAM\1", 4);
    put_u32((uint32_t)strlen(text));
    put(text, strlen(text));
    put_u32(2);                       /* n_ref */
    put_u32(6); put("chrF1", 6); put_u32(100000);
    put_u32(6); put("chrF2", 6); put_u32(50000);

    /* spliced long read: 20M 100N 20M, fwd, XS:A:+ */
    uint32_t c1[3] = {20u << 4 | 0, 100u << 4 | 3, 20u << 4 | 0};
    struct auxi a1[4] = {{{'N','M'},'i',1,0}, {{'A','S'},'i',70,0},
                         {{'N','H'},'i',1,0}, {{'X','S'},'A',0,'+'}};
    put_record(0, 99, 0, 60, "longread1", c1, 3,
               "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT", NULL,
               -1, -1, 0, a1, 4);

    /* reverse-strand read with soft clips on chrF2 */
    uint32_t c2[3] = {5u << 4 | 4, 30u << 4 | 0, 5u << 4 | 4};
    struct auxi a2[3] = {{{'N','M'},'i',2,0}, {{'A','S'},'i',52,0},
                         {{'N','H'},'i',1,0}};
    put_record(1, 199, 16, 42, "revread2", c2, 3,
               "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT", NULL,
               -1, -1, 0, a2, 3);

    /* unmapped record */
    put_record(-1, -1, 4, 0, "unmapped3", NULL, 0, "ACGT", NULL, -1, -1, 0,
               NULL, 0);

    /* proper-paired spliced short-read mates (for bam2sj) */
    uint32_t c4[3] = {10u << 4 | 0, 50u << 4 | 3, 10u << 4 | 0};
    struct auxi a4[1] = {{{'N','H'},'i',1,0}};
    put_record(0, 999, 99, 60, "pair4", c4, 3, "ACGTACGTACGTACGTACGT",
               "IIIIIIIIIIIIIIIIIIII", 0, 1199, 270, a4, 1);
    uint32_t c5[1] = {20u << 4 | 0};
    put_record(0, 1199, 147, 60, "pair4", c5, 1, "ACGTACGTACGTACGTACGT",
               "IIIIIIIIIIIIIIIIIIII", 0, 999, -270, a4, 1);

    FILE *f = fopen(out, "wb");
    if (!f) { perror(out); return 1; }
    write_bgzf_block(f, payload, plen);
    static const uint8_t eof[28] = {
        0x1f, 0x8b, 0x08, 0x04, 0, 0, 0, 0, 0, 0xff, 0x06, 0x00,
        0x42, 0x43, 0x02, 0x00, 0x1b, 0x00, 0x03, 0x00, 0, 0, 0, 0,
        0, 0, 0, 0};
    fwrite(eof, 1, 28, f);
    fclose(f);
    fprintf(stderr, "wrote %s (%zu payload bytes)\n", out, plen);
    return 0;
}
