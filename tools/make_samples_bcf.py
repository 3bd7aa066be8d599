#!/usr/bin/env python3
"""Generate src/test/resources/fixtures/vcf/samples.bcf — the BCF twin of
samples.vcf (2 records, FORMAT GT:GQ, samples s1/s2) — from the published
BCF2.2 spec encoding. Dev tool; run once, commit the output.
"""
import struct
import zlib


def bgzf_block(data):
    """One BGZF block: gzip member with the BC/BSIZE extra subfield."""
    raw = zlib.compress(data, 9)[2:-4]  # raw deflate (strip zlib wrapper)
    bsize = 18 + len(raw) + 8  # header + deflate + crc32/isize
    header = struct.pack('<4BIBBHBBHH',
                         0x1f, 0x8b, 8, 4,      # magic, CM=deflate, FLG=FEXTRA
                         0, 0, 0xff,            # mtime, XFL, OS
                         6,                     # XLEN
                         ord('B'), ord('C'), 2, # BC subfield, SLEN=2
                         bsize - 1)             # BSIZE
    return header + raw + struct.pack('<II', zlib.crc32(data), len(data))


# the spec's fixed 28-byte EOF marker (an empty BGZF block)
BGZF_EOF = bytes.fromhex(
    '1f8b08040000000000ff0600424302001b0003000000000000000000')

HEADER = (
    b'##fileformat=VCFv4.2\n'
    b'##FILTER=<ID=PASS,Description="All filters passed">\n'
    b'##INFO=<ID=DP,Number=1,Type=Integer,Description="Raw read depth">\n'
    b'##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">\n'
    b'##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="Genotype quality">\n'
    b'##contig=<ID=1>\n'
    b'#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1\ts2\n\x00'
)
# dictionary (appearance order, PASS=0): PASS=0 DP=1 GT=2 GQ=3


def typed_str(s):
    assert 0 < len(s) < 15
    return bytes([len(s) << 4 | 7]) + s.encode()


def typed_i8(v):
    return bytes([0x11, v & 0xff])


def record(pos0, ref, alt, qual, dp, gts, gqs):
    n_sample = len(gts)
    shared = struct.pack('<iiif', 0, pos0, 1, qual)
    shared += struct.pack('<i', (2 << 16) | 1)        # n_allele=2, n_info=1
    shared += struct.pack('<i', (2 << 24) | n_sample)  # n_fmt=2
    shared += bytes([0x07])                            # ID missing
    shared += typed_str(ref) + typed_str(alt)
    shared += bytes([0x11, 0x00])                      # FILTER = [PASS]
    shared += typed_i8(1) + typed_i8(dp)               # INFO DP
    indiv = typed_i8(2)                                # FORMAT key GT
    indiv += bytes([0x21])                             # int8 x2 (diploid)
    for a, b in gts:                                   # (allele+1)<<1|phase
        indiv += bytes([a, b])
    indiv += typed_i8(3)                               # FORMAT key GQ
    indiv += bytes([0x11])                             # int8 x1
    for q in gqs:
        indiv += bytes([q])
    return struct.pack('<II', len(shared), len(indiv)) + shared + indiv


body = b'BCF\x02\x02' + struct.pack('<I', len(HEADER)) + HEADER
# 1:100 A>C qual 50 DP=10  s1 0/1 GQ=99  s2 1/1 GQ=42
body += record(99, 'A', 'C', 50.0, 10, [(2, 4), (4, 4)], [99, 42])
# 1:200 G>T qual 30 DP=5   s1 0/0 GQ=10  s2 0/1 GQ=77
body += record(199, 'G', 'T', 30.0, 5, [(2, 2), (2, 4)], [10, 77])

out = 'src/test/resources/fixtures/vcf/samples.bcf'
with open(out, 'wb') as f:
    f.write(bgzf_block(body) + BGZF_EOF)
print(f'wrote {out}')
