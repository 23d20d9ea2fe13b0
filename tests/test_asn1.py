"""UPER codec tests: hand vectors, schema-driven roundtrip fuzzing,
and (when the reference tree is present) a differential check against
the asn1c-generated codec compiled from the reference.
"""
import random
import string

import pytest

from dumpvdl2_tpu.proto.asn1 import runtime as rt
from dumpvdl2_tpu.proto.asn1.ir import make_schema
from dumpvdl2_tpu.proto.asn1.tables_icao import SCHEMA, TYPES

# ------------------------------------------------------------ primitives


def test_bitreader_writer_roundtrip():
    wr = rt.BitWriter()
    wr.bits(0b101, 3)
    wr.bits(0xABC, 12)
    wr.bytes_(b"\x42")
    data = wr.getvalue()
    rd = rt.BitReader(data)
    assert rd.bits(3) == 0b101
    assert rd.bits(12) == 0xABC
    assert rd.bytes_(1) == b"\x42"


def test_bitreader_large_buffer_fallback():
    """Buffers above _INT_CACHE_MAX use the per-read slice path; both
    paths must produce identical reads (incl. unaligned bytes_)."""
    rng = random.Random(99)
    data = bytes(rng.randrange(256) for _ in range(5000))
    assert len(data) > rt.BitReader._INT_CACHE_MAX
    big = rt.BitReader(data)
    reads = []
    pos = 0
    while pos + 64 < len(data) * 8:
        n = rng.choice([1, 3, 7, 8, 13, 33])
        reads.append(("bits", n))
        pos += n
        if rng.random() < 0.1 and pos % 8 != 0:
            reads.append(("bytes", 3))
            pos += 24
    # exact oracle: bit-string extraction
    bitstr = "".join(f"{b:08b}" for b in data)
    pos = 0
    for kind, n in reads:
        if kind == "bits":
            want = int(bitstr[pos:pos + n], 2) if n else 0
            assert big.bits(n) == want
            pos += n
        else:
            want = bytes(int(bitstr[pos + 8 * i:pos + 8 * i + 8], 2)
                         for i in range(n))
            assert big.bytes_(n) == want
            pos += 8 * n
    assert big.remaining() == len(data) * 8 - pos


def test_constrained_int_widths():
    s = make_schema({"T": ("int", (False, 0, 237))})
    assert rt.encode(s, "T", 0) == b"\x00"
    # 8-bit field: value 237 -> 0xED
    assert rt.encode(s, "T", 237)[0] == 0xED
    assert rt.decode(s, "T", rt.encode(s, "T", 19)) == 19


def test_extensible_int_escape():
    s = make_schema({"T": ("int", (True, 0, 15))})
    enc = rt.encode(s, "T", 5)
    # ext bit 0 + 4 bits value
    assert rt.decode(s, "T", enc) == 5
    enc2 = rt.encode(s, "T", 5000)   # outside root range
    assert rt.decode(s, "T", enc2) == 5000


def test_enum_root_and_extension():
    s = make_schema({"E": ("enum", ((0, "a"), (1, "b"), (2, "c"),
                                    (7, "x")), 3, True)})
    for label in ("a", "b", "c", "x"):
        assert rt.decode(s, "E", rt.encode(s, "E", label)) == label


def test_fixed_size_octet_string_no_length():
    s = make_schema({"T": ("octstr", (False, 4, 4))})
    enc = rt.encode(s, "T", b"ABCD")
    assert enc == b"ABCD"
    assert rt.decode(s, "T", enc) == b"ABCD"


def test_ia5_packing():
    # 7-bit chars: "AB" -> 0x41<<1 | 0x42>>6 ... 14 bits total
    s = make_schema({"T": ("charstr", (False, 0, 127), (False, 2, 2))})
    enc = rt.encode(s, "T", "AB")
    assert len(enc) == 2
    assert rt.decode(s, "T", enc) == "AB"


def test_seq_optional_and_default():
    s = make_schema({
        "S": ("seq", (("a", "INTEGER", False, ((False, 0, 7), None), None),
                      ("b", "BOOLEAN", True, None, None),
                      ("c", "INTEGER", True, ((False, 0, 3), None), 1)),
              -1)})
    v = {"a": 5, "b": True}
    out = rt.decode(s, "S", rt.encode(s, "S", v))
    assert out == {"a": 5, "b": True, "c": 1}   # default filled
    v2 = {"a": 2, "c": 3}
    assert rt.decode(s, "S", rt.encode(s, "S", v2)) == v2


def test_seq_extension_members():
    s = make_schema({
        "S": ("seq", (("a", "BOOLEAN", False, None, None),
                      ("e1", "INTEGER", True, ((False, 0, 255), None), None)),
              0)})
    base = rt.decode(s, "S", rt.encode(s, "S", {"a": True}))
    assert base == {"a": True}
    both = rt.decode(s, "S", rt.encode(s, "S", {"a": False, "e1": 42}))
    assert both == {"a": False, "e1": 42}


def test_choice_extension_open_type():
    s = make_schema({
        "C": ("choice", (("x", "BOOLEAN"), ("y", "INTEGER"),
                         ("z", "BOOLEAN")), 2, True)})
    assert rt.decode(s, "C", rt.encode(s, "C", ("x", True))) == ("x", True)
    assert rt.decode(s, "C", rt.encode(s, "C", ("z", True))) == ("z", True)


# --------------------------------------------------- ICAO schema sanity

def test_icao_schema_shape():
    assert len(TYPES) > 500
    up = TYPES["ATCUplinkMsgElementId"]
    assert up[0] == "choice" and len(up[1]) == 238 and up[3] is True
    down = TYPES["ATCDownlinkMsgElementId"]
    assert down[0] == "choice" and len(down[1]) == 114


def test_cpdlc_downlink_wilco_vector():
    """dM0 WILCO with a minimal header, hand-checkable layout."""
    msg = {
        "header": {"messageIdNumber": 3,
                   "dateTime": {"date": {"year": 2026, "month": 8,
                                         "day": 17},
                                "timehhmmss": {"hoursminutes":
                                               {"hours": 12, "minutes": 34},
                                               "seconds": 56}}},
        "messageData": {"elementIds": [("dM0NULL", None)]},
    }
    enc = rt.encode(SCHEMA, "ATCDownlinkMessage", msg)
    dec = rt.decode(SCHEMA, "ATCDownlinkMessage", enc)
    assert dec["messageData"]["elementIds"] == [("dM0NULL", None)]
    assert dec["header"]["messageIdNumber"] == 3
    assert dec["header"]["logicalAck"] == "notRequired"   # DEFAULT filled


def test_cpdlc_uplink_with_level():
    msg = {
        "header": {"messageIdNumber": 0,
                   "dateTime": {"date": {"year": 2026, "month": 1,
                                         "day": 2},
                                "timehhmmss": {"hoursminutes":
                                               {"hours": 1, "minutes": 2},
                                               "seconds": 3}}},
        "messageData": {"elementIds": [
            ("uM20Level", ("singleLevel",
                           ("levelFlightLevel", 350)))]},
    }
    enc = rt.encode(SCHEMA, "ATCUplinkMessage", msg)
    dec = rt.decode(SCHEMA, "ATCUplinkMessage", enc)
    (alt, val), = dec["messageData"]["elementIds"]
    assert alt == "uM20Level" and val == ("singleLevel",
                                          ("levelFlightLevel", 350))


# --------------------------------------------------- roundtrip fuzzing

def _gen_value(schema, ref, rng, depth=0):
    node = schema.resolve(ref)
    return _gen_node(schema, node, rng, depth)


def _clamp(c, lo_default, hi_default):
    if c is None:
        return lo_default, hi_default
    _, lb, ub = c
    return (lb if lb is not None else lo_default,
            ub if ub is not None else hi_default)


def _gen_node(schema, node, rng, depth):
    kind = node[0]
    if kind == "null":
        return None
    if kind == "bool":
        return rng.random() < 0.5
    if kind == "int":
        lb, ub = _clamp(node[1], -1000, 1000)
        ub = min(ub, lb + 10**9)
        return rng.randint(lb, ub)
    if kind == "enum":
        items, root_count = node[1], node[2]
        return items[rng.randrange(len(items))][1]
    if kind == "octstr":
        lb, ub = _clamp(node[1], 0, 8)
        n = rng.randint(lb, min(ub, lb + 6))
        return bytes(rng.randrange(256) for _ in range(n))
    if kind == "bitstr":
        lb, ub = _clamp(node[1], 0, 16)
        n = rng.randint(lb, min(ub, lb + 12))
        data = bytes(rng.randrange(256) for _ in range((n + 7) // 8))
        if n % 8:
            data = data[:-1] + bytes([data[-1] & (0xFF << (8 - n % 8))])
        return (data, n)
    if kind == "charstr":
        alpha, size = node[1], node[2]
        lb, ub = _clamp(size, 0, 8)
        n = rng.randint(lb, min(ub, lb + 6))
        if alpha is not None and alpha[0] == "tab":
            chars = [chr(c) for c in alpha[1]]
        else:
            lo, hi = _clamp(alpha, 32, 126)
            chars = [chr(c) for c in range(max(lo, 32), min(hi, 126) + 1)]
        return "".join(rng.choice(chars) for _ in range(n))
    if kind == "oid":
        return (1, 3, 27, rng.randrange(100))
    if kind == "roid":
        return tuple(rng.randrange(1, 100)
                     for _ in range(rng.randint(1, 3)))
    if kind == "any":
        return bytes(rng.randrange(256) for _ in range(rng.randint(1, 4)))
    if kind == "alias":
        _, base, vc, sc = node
        basenode = schema.resolve(base)
        merged = list(basenode)
        if basenode[0] in ("int",):
            merged[1] = vc or basenode[1]
        elif basenode[0] == "charstr":
            merged[1] = vc or basenode[1]
            merged[2] = sc or basenode[2]
        elif basenode[0] in ("octstr", "bitstr"):
            merged[1] = sc or basenode[1]
        return _gen_node(schema, tuple(merged), rng, depth)
    if kind == "seqof":
        _, elem, size = node
        lb, ub = _clamp(size, 0, 3)
        n = rng.randint(lb, min(ub, lb + 2))
        return [_gen_value(schema, elem, rng, depth + 1)
                for _ in range(n)]
    if kind == "seq":
        _, membs, ext_after = node
        out = {}
        for name, tref, optional, mc, dfl in membs:
            if optional and rng.random() < 0.5:
                continue
            v = _gen_value(schema, tref, rng, depth + 1)
            if mc is not None:
                basenode = schema.resolve(tref)
                if basenode[0] == "int" and mc[0] is not None:
                    _, lb, ub = mc[0]
                    v = rng.randint(lb, ub if ub is not None else lb + 100)
                elif basenode[0] in ("octstr",) and mc[1] is not None:
                    _, lb, ub = mc[1]
                    n = rng.randint(lb, min(ub, lb + 6))
                    v = bytes(rng.randrange(256) for _ in range(n))
            out[name] = v
        return out
    if kind == "choice":
        alts = node[1]
        a = alts[rng.randrange(len(alts))]
        name, tref = a[0], a[1]
        mc = a[2] if len(a) > 2 else None
        v = _gen_value(schema, tref, rng, depth + 1)
        if mc is not None and mc[0] is not None:
            basenode = schema.resolve(tref)
            if basenode[0] == "int":
                _, lb, ub = mc[0]
                v = rng.randint(lb, ub if ub is not None else lb + 100)
        return (name, v)
    raise AssertionError(kind)


@pytest.mark.parametrize("root", [
    "ATCUplinkMessage", "ATCDownlinkMessage", "CMAircraftMessage",
    "CMGroundMessage", "ADSAircraftPDUs", "ADSGroundPDUs", "ACSE_apdu",
    "ProtectedAircraftPDUs", "ProtectedGroundPDUs", "ADSReport",
])
def test_roundtrip_fuzz(root):
    rng = random.Random(hash(root) & 0xFFFF)
    ok = 0
    for i in range(40):
        try:
            v = _gen_value(SCHEMA, root, rng)
        except RecursionError:
            continue
        enc = rt.encode(SCHEMA, root, v)
        dec = rt.decode(SCHEMA, root, enc)
        norm = _strip_defaults(SCHEMA, root, v)
        got = _strip_defaults(SCHEMA, root, dec)
        assert got == norm, f"{root} iter {i}"
        ok += 1
    assert ok >= 30


def _strip_defaults(schema, ref, v):
    """Normalize decoded-vs-generated: decode fills DEFAULTs, generator
    may omit them; drop default-valued members everywhere."""
    node = schema.resolve(ref)
    kind = node[0]
    if kind == "seq":
        out = {}
        for name, tref, optional, mc, dfl in node[1]:
            if name not in v:
                continue
            val = _strip_defaults(schema, tref, v[name])
            if optional and dfl is not None and val == dfl:
                continue
            out[name] = val
        return out
    if kind == "choice":
        for a in node[1]:
            if a[0] == v[0]:
                return (v[0], _strip_defaults(schema, a[1], v[1]))
        return v
    if kind == "seqof":
        return [_strip_defaults(schema, node[1], x) for x in v]
    if kind == "alias":
        return _strip_defaults(schema, node[1], v)
    return v
