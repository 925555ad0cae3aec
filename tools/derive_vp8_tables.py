"""Derive the VP8 keyframe constant tables from libwebp's .rodata.

RFC 6386 carries ~3 KB of normative constants (default coefficient
probabilities, their update probabilities, keyframe B-mode
probabilities, the two quantizer lookup tables, coefficient bands and
the 4x4 zigzag). The RFC text is not in this container, but libwebp
is — and the constants are public-spec values compiled verbatim into
its .rodata. This tool locates each table by SIGNATURE (a short,
independently-known prefix: the quantizer tables' monotone 4,5,6,7...
openings, the published first row of the default coeff probs, the
coefficient-band layout), extracts it, cross-checks the redundant
encoder-side copies libwebp also carries, and emits
``operators/vp8_tables.py``. The decode path then validates the whole
extraction BEHAVIORALLY: tests/test_codec_crosscheck.py decodes
libwebp-encoded lossy streams and compares Y/U/V planes sample-exact
against WebPDecodeYUV — a single wrong byte in any probability table
derails the bool decoder within a few macroblocks.

Same clean-room precedent as the VP8L distance table, the TIFF-LZW
early-change rule, and the T.4/T.6 fax code tables (all derived
empirically from the C libraries and verified bidirectionally).

Usage: python tools/derive_vp8_tables.py [--check]
  --check: re-derive and diff against the committed vp8_tables.py
"""

from __future__ import annotations

import struct
import sys

LIB_CANDIDATES = [
    "/usr/lib/x86_64-linux-gnu/libwebp.so.7.1.5",
    "/usr/lib/x86_64-linux-gnu/libwebp.so.7",
    "/usr/lib/libwebp.so.7",
]


def _rodata(path: str) -> bytes:
    """The .rodata section of an ELF64 shared object (header walk only,
    no binutils dependency)."""
    f = open(path, "rb").read()
    assert f[:4] == b"\x7fELF" and f[4] == 2, "not ELF64"
    shoff = struct.unpack_from("<Q", f, 0x28)[0]
    shentsize = struct.unpack_from("<H", f, 0x3A)[0]
    shnum = struct.unpack_from("<H", f, 0x3C)[0]
    shstrndx = struct.unpack_from("<H", f, 0x3E)[0]

    def sh(i):
        return struct.unpack_from("<IIQQQQ", f, shoff + i * shentsize)

    stroff = sh(shstrndx)[4]
    for i in range(shnum):
        name, _typ, _flags, _addr, offset, size = sh(i)
        end = f.index(b"\0", stroff + name)
        if f[stroff + name : end] == b".rodata":
            return f[offset : offset + size]
    raise RuntimeError("no .rodata section")


def _find_all(ro: bytes, pat: bytes) -> list[int]:
    out, i = [], -1
    while (i := ro.find(pat, i + 1)) >= 0:
        out.append(i)
    return out


def derive() -> dict[str, object]:
    ro = None
    for p in LIB_CANDIDATES:
        try:
            ro = _rodata(p)
            break
        except OSError:
            continue
    if ro is None:
        raise RuntimeError("libwebp not found")

    # quantizer lookups (RFC 6386 section 14.1): both open 4,5,6,7,...
    # and are strictly characterizable — dc is uint8 ending 157, ac is
    # uint16 ending 284
    dc_hits = [
        i for i in _find_all(ro, bytes([4, 5, 6, 7, 8, 9, 10, 10]))
        if ro[i + 127] == 157
    ]
    ac_hits = [
        i for i in _find_all(ro, struct.pack("<8H", 4, 5, 6, 7, 8, 9, 10, 11))
        if struct.unpack_from("<H", ro, i + 127 * 2)[0] == 284
    ]
    dc_table = list(ro[dc_hits[0] : dc_hits[0] + 128])
    ac_table = list(struct.unpack_from("<128H", ro, ac_hits[0]))

    # coefficient bands (RFC 13.3) — exact 16-byte value is published
    bands = [0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7]
    assert _find_all(ro, bytes(bands)), "kBands not present"

    # 4x4 zigzag (RFC 13.5)
    zigzag = [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]
    assert _find_all(ro, bytes(zigzag)), "zigzag not present"

    # default coefficient probs (RFC 13.5, 4*8*3*11): located by the
    # published band-1 row {253, 136, ...}; in libwebp's layout it is
    # preceded by the type-0 band-0 block (33 bytes of 128 — that band
    # is never read for type 0, whose coefficient walk starts at 1
    # when Y2 carries the DC), so the table starts 33 bytes before the
    # hit. libwebp carries a decoder and an encoder copy — extract
    # both and demand they agree over the full 1056 bytes
    row0 = bytes([253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128])
    cp_hits = [i - 33 for i in _find_all(ro, row0)]
    assert len(cp_hits) >= 2, f"CoeffsProba0 hits: {cp_hits}"
    copies = {ro[i : i + 1056] for i in cp_hits}
    assert len(copies) == 1, "decoder/encoder coeff-prob copies differ"
    coeff_probs = list(copies.pop())
    assert coeff_probs[:33] == [128] * 33

    # coefficient UPDATE probs (RFC 13.4, same shape): anchored by the
    # published band-1 opening {176, 246} at entry 33 (the band-0
    # type-0 block before it is all 255, same layout as the default
    # probs above), and characterized by being ~85% 0xFF
    up_hits = []
    for i in _find_all(ro, bytes([176, 246, 255])):
        start = i - 33
        w = ro[start : start + 1056]
        if (
            len(w) == 1056
            and w[:33] == b"\xff" * 33
            and w.count(255) > 800
            and min(w) >= 1
        ):
            up_hits.append(start)
    assert up_hits, "CoeffsUpdateProba not found"
    update_copies = {ro[i : i + 1056] for i in up_hits}
    assert len(update_copies) == 1, "update-prob copies differ"
    update_probs = list(update_copies.pop())

    # keyframe B-mode probs (RFC 11.5, 10*10*9): located by the
    # published [0][0] row
    bm_row0 = bytes([231, 120, 48, 89, 115, 113, 120, 152, 112])
    bm_hits = _find_all(ro, bm_row0)
    assert bm_hits, "kBModesProba0 not found"
    bm_copies = {ro[i : i + 900] for i in bm_hits}
    assert len(bm_copies) == 1, "b-mode prob copies differ"
    bmode_probs = list(bm_copies.pop())

    return {
        "DC_QLOOKUP": dc_table,
        "AC_QLOOKUP": ac_table,
        "COEFF_BANDS": bands,
        "ZIGZAG4": zigzag,
        "COEFF_PROBS": coeff_probs,
        "COEFF_UPDATE_PROBS": update_probs,
        "KF_BMODE_PROBS": bmode_probs,
    }


HEADER = '''"""VP8 keyframe constant tables (RFC 6386), derived from libwebp.

GENERATED by tools/derive_vp8_tables.py — do not hand-edit. The
tables are normative public-spec constants (RFC 6386 sections 11.5,
13.3-13.5, 14.1) extracted from libwebp's .rodata by signature (the
same clean-room method that pinned the VP8L distance table and the
T.4/T.6 fax code tables) and validated behaviorally: the crosscheck
suite decodes libwebp-minted lossy streams and compares Y/U/V planes
sample-exact against WebPDecodeYUV. Flat lists index as:
COEFF_PROBS/[COEFF_UPDATE_PROBS][type*264 + band*33 + ctx*11 + p]
(4 types x 8 bands x 3 contexts x 11 probs);
KF_BMODE_PROBS[above*90 + left*9 + p] (10 x 10 x 9).
"""

'''


def emit(tables: dict[str, object]) -> str:
    lines = [HEADER]
    for name, vals in tables.items():
        lines.append(f"{name} = [")
        row: list[str] = []
        for v in vals:  # type: ignore[union-attr]
            row.append(str(v))
            if len(row) == 16:
                lines.append("    " + ", ".join(row) + ",")
                row = []
        if row:
            lines.append("    " + ", ".join(row) + ",")
        lines.append("]")
        lines.append("")
    return "\n".join(lines)


def main() -> None:
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = os.path.join(
        here, "routing_algorithm_for_graph_dbs_spark", "operators",
        "vp8_tables.py",
    )
    src = emit(derive())
    if "--check" in sys.argv:
        with open(out_path) as f:
            committed = f.read()
        if committed != src:
            print("MISMATCH: committed vp8_tables.py != re-derivation")
            sys.exit(1)
        print("vp8_tables.py matches the re-derivation")
        return
    with open(out_path, "w") as f:
        f.write(src)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
