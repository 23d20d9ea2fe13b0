#!/usr/bin/env python3
"""Recover the ICAO ATN B1 ASN.1 schema from asn1c-generated C and emit
it as declarative Python IR (dumpvdl2_tpu/proto/asn1/ir.py format).

The schema itself (type/field names, constraints, enum labels) is the
ICAO Doc 9705/9880 standard interface — the generated C under
/root/reference/src/asn1/ is just one serialization of it.  This tool
re-expresses that standard schema as data tables; no reference *code*
is carried over (the UPER codec interpreting these tables is
dumpvdl2_tpu/proto/asn1/runtime.py, written independently).

Usage: python tools/gen_asn1_tables.py [asn1dir] [out.py]
"""
from __future__ import annotations

import re
import sys
from pathlib import Path

ASN1_DIR = Path(sys.argv[1] if len(sys.argv) > 1
                else "/root/reference/src/asn1")
OUT = Path(sys.argv[2] if len(sys.argv) > 2
           else "dumpvdl2_tpu/proto/asn1/tables_icao.py")

ROOTS = [
    "ACSE_apdu", "Fully_encoded_data",
    "ProtectedAircraftPDUs", "ProtectedGroundPDUs",
    "ATCUplinkMessage", "ATCDownlinkMessage",
    "CMAircraftMessage", "CMGroundMessage",
    "ADSAircraftPDUs", "ADSGroundPDUs",
    "ADSAccept", "ADSReject", "ADSReport", "ADSNonCompliance",
    "ADSPositiveAcknowledgement", "ADSRequestContract",
]

BUILTIN_TYPES = {
    "NULL", "BOOLEAN", "NativeInteger", "INTEGER", "NativeEnumerated",
    "ENUMERATED", "OCTET_STRING", "BIT_STRING", "IA5String",
    "NumericString", "ObjectDescriptor", "GraphicString",
    "OBJECT_IDENTIFIER", "RELATIVE_OID", "ANY", "UTF8String", "VisibleString",
}

_COMMENT_RE = re.compile(r"/\*.*?\*/", re.S)


def strip_comments(text: str) -> str:
    return _COMMENT_RE.sub(" ", text)


def parse_int(tok: str) -> int:
    tok = tok.strip().rstrip("LUlu").replace("(", "").replace(")", "")
    return int(tok, 0)


CONSTR_RE = re.compile(
    r"static\s+asn_per_constraints_t\s+(\w+)\s+GCC_NOTUSED\s*=\s*\{"
    r"\s*\{\s*([^}]*)\}\s*,\s*\{\s*([^}]*)\}\s*,\s*([^;]*?)\};", re.S)

MEMBER_ARR_RE = re.compile(
    r"static\s+asn_TYPE_member_t\s+(asn_MBR_\w+)\[\]\s*=\s*\{(.*?)\n\};",
    re.S)
MEMBER_RE = re.compile(
    r"\{\s*(ATF_\w+)\s*,\s*(\d+)\s*,\s*(?:offsetof\([^)]*\)|0)\s*,"
    r"(.*?)\"([^\"]*)\"\s*\}", re.S)

SEQ_SPEC_RE = re.compile(
    r"asn_SEQUENCE_specifics_t\s+(asn_SPC_\w+)\s*=\s*\{"
    r"\s*sizeof\([^)]*\),\s*offsetof\([^)]*\),\s*(\w+|0),\s*(-?\d+),"
    r"\s*(\w+|0),\s*(-?\d+),\s*(-?\d+),\s*(-?\d+),\s*(-?\d+)\s*\};", re.S)
CHOICE_SPEC_RE = re.compile(
    r"asn_CHOICE_specifics_t\s+(asn_SPC_\w+)\s*=\s*\{[^;]*?,"
    r"\s*(-?\d+)\s*\};", re.S)
SETOF_SPEC_RE = re.compile(r"asn_SET_OF_specifics_t\s+(asn_SPC_\w+)")
INT_SPEC_RE = re.compile(
    r"asn_INTEGER_specifics_t\s+(asn_SPC_\w+)\s*=\s*\{"
    r"\s*(\w+),\s*(\w+),\s*(\d+),\s*(\d+),\s*(\d+),", re.S)
V2E_RE = re.compile(
    r"asn_INTEGER_enum_map_t\s+(asn_MAP_\w+_value2enum_\d+)\[\]\s*=\s*\{"
    r"(.*?)\};", re.S)
V2E_ENTRY_RE = re.compile(r"\{\s*(-?\d+)\s*,\s*\d+\s*,\s*\"([^\"]*)\"\s*\}")
C2V_RE = re.compile(
    r"static\s+const\s+int\s+(permitted_alphabet_code2value_\d+)"
    r"\[\d*\]\s*=\s*\{([^;]*)\};", re.S)
DESC_RE = re.compile(
    r"asn_TYPE_descriptor_t\s+asn_DEF_(\w+)\s*=\s*\{"
    r"\s*\"([^\"]*)\",\s*\"[^\"]*\",\s*(\w+?)_free\s*,(.*?)\};", re.S)
INHERIT_RE = re.compile(
    r"(\w+)_\d+_inherit_TYPE_descriptor\s*\([^)]*\)\s*\{\s*"
    r"td->free_struct\s*=\s*asn_DEF_(\w+)\.free_struct", re.S)
DFL_RE = re.compile(r"asn_DFL_\d+_set_(-?\d+)")


def parse_constraint_half(body: str):
    """'APC_CONSTRAINED | APC_EXTENSIBLE, 8, 8, 0, 237' -> IR triple."""
    parts = [p.strip() for p in body.split(",")]
    flags = parts[0]
    lb, ub = parse_int(parts[3]), parse_int(parts[4])
    ext = "APC_EXTENSIBLE" in flags
    if "APC_SEMI_CONSTRAINED" in flags:
        return (ext, lb, None)
    if "APC_CONSTRAINED" in flags:
        return (ext, lb, ub)
    if ext:
        return (True, None, None)
    return None


class TypeInfo:
    def __init__(self, file: Path, cname: str, dispname: str, ops: str,
                 body: str):
        self.file = file
        self.cname = cname
        self.dispname = dispname
        self.ops = ops
        self.body = body


def main() -> None:
    # ---------------------------------------------------- parse pass
    files = sorted(ASN1_DIR.glob("*.c"))
    constrs = {}          # (file, name) -> (value_c, size_c)
    members = {}          # (file, arrname) -> [member dicts]
    seq_specs = {}        # (file, specname) -> dict
    choice_specs = {}     # (file, specname) -> ext_start
    setof_specs = set()   # (file, specname)
    int_specs = {}        # (file, specname) -> (v2e_name, count, extension)
    v2e_maps = {}         # (file, mapname) -> [(value, label)]
    c2v_maps = {}         # (file, mapname) -> [codes]
    descs = {}            # (file, cname) -> TypeInfo
    inherits = {}         # (file, typename) -> base

    for f in files:
        if f.name in ("converter-sample.c",):
            continue
        raw = f.read_text(errors="replace")
        txt = strip_comments(raw)
        for m in CONSTR_RE.finditer(txt):
            name, val, siz, _rest = m.groups()
            constrs[(f.name, name)] = (parse_constraint_half(val),
                                       parse_constraint_half(siz))
        for m in MEMBER_ARR_RE.finditer(txt):
            arrname, body = m.groups()
            ms = []
            for e in MEMBER_RE.finditer(body):
                flags, opt, middle, name = e.groups()
                tref = re.search(r"&asn_DEF_(\w+)", middle)
                perc = re.search(r"&(asn_PER_memb_\w+)", middle)
                dfl = DFL_RE.search(middle)
                ms.append(dict(optional=int(opt) != 0 or
                               (flags == "ATF_POINTER" and name == ""),
                               tref=tref.group(1) if tref else None,
                               perc=perc.group(1) if perc else None,
                               default=int(dfl.group(1)) if dfl else None,
                               name=name))
            members[(f.name, arrname)] = ms
        for m in SEQ_SPEC_RE.finditer(txt):
            spec, _t2e, _cnt, oms, roms, aoms, ext_a, ext_b = m.groups()
            seq_specs[(f.name, spec)] = dict(
                roms=int(roms), aoms=int(aoms),
                ext_after=int(ext_a), ext_before=int(ext_b))
        for m in CHOICE_SPEC_RE.finditer(txt):
            choice_specs[(f.name, m.group(1))] = int(m.group(2))
        for m in SETOF_SPEC_RE.finditer(txt):
            setof_specs.add((f.name, m.group(1)))
        for m in INT_SPEC_RE.finditer(txt):
            spec, v2e, _e2v, cnt, extn, _strict = m.groups()
            int_specs[(f.name, spec)] = (v2e, int(cnt), int(extn))
        for m in V2E_RE.finditer(txt):
            v2e_maps[(f.name, m.group(1))] = [
                (int(e.group(1)), e.group(2))
                for e in V2E_ENTRY_RE.finditer(m.group(2))]
        for m in C2V_RE.finditer(txt):
            c2v_maps[(f.name, m.group(1))] = [
                parse_int(t) for t in m.group(2).split(",") if t.strip()]
        for m in DESC_RE.finditer(txt):
            cname, disp, ops, body = m.groups()
            descs[(f.name, cname)] = TypeInfo(f, cname, disp, ops, body)
        for m in INHERIT_RE.finditer(txt):
            inherits[(f.name, m.group(1))] = m.group(2)

    # --------------------------------------------- reference resolution
    stem_of = {}
    for (fname, cname) in descs:
        stem = fname[:-2].replace("-", "_")
        if cname == stem:
            stem_of[cname] = fname

    def global_name(fname: str, cname: str) -> str:
        stem = fname[:-2].replace("-", "_")
        if cname == stem:
            return cname
        return f"{stem}.{cname}"

    def resolve_ref(fname: str, cname: str) -> str:
        if cname in BUILTIN_TYPES:
            # runtime builtin names
            return {"NativeEnumerated": "INTEGER",
                    "ENUMERATED": "INTEGER"}.get(cname, cname)
        if (fname, cname) in descs:
            return global_name(fname, cname)
        if cname in stem_of:
            return cname
        raise KeyError(f"{fname}: unresolved reference {cname}")

    def find_constr(fname: str, body_or_name):
        """Find &asn_PER_... reference in a descriptor body."""
        m = re.search(r"&(asn_PER_type_\w+)", body_or_name)
        if not m:
            return (None, None)
        return constrs.get((fname, m.group(1)), (None, None))

    # ---------------------------------------------------- IR emission
    out_types = {}

    def emit(fname: str, cname: str) -> str:
        gname = global_name(fname, cname)
        if gname in out_types:
            return gname
        out_types[gname] = None         # recursion guard
        ti = descs[(fname, cname)]
        ops = ti.ops
        body = ti.body
        vc, sc = find_constr(fname, body)
        mbr_m = re.search(r"(asn_MBR_\w+),\s*(\d+),", body)
        mlist = (members.get((fname, mbr_m.group(1)), [])[: int(mbr_m.group(2))]
                 if mbr_m else [])
        spec_m = re.search(r"&(asn_SPC_\w+)", body)
        spec = spec_m.group(1) if spec_m else None
        base = inherits.get((fname, cname))

        def memb_constr(perc):
            if perc is None:
                return None
            pair = constrs.get((fname, perc))
            return pair

        def conv_members():
            out = []
            for mm in mlist:
                tref = resolve_ref(fname, mm["tref"])
                if mm["tref"] in BUILTIN_TYPES:
                    pass
                elif (fname, mm["tref"]) in descs:
                    emit(fname, mm["tref"])
                elif mm["tref"] in stem_of:
                    emit(stem_of[mm["tref"]], mm["tref"])
                out.append((mm["name"], tref, mm["optional"],
                            memb_constr(mm["perc"]), mm["default"]))
            return out

        if ops == "SEQUENCE":
            sp = seq_specs[(fname, spec)]
            node = ("seq", tuple(conv_members()), sp["ext_after"])
        elif ops == "CHOICE":
            ext_start = choice_specs[(fname, spec)]
            alts = tuple((m[0], m[1], m[3]) for m in conv_members())
            if vc is not None and vc[2] is not None:
                root_count = vc[2] + 1
                extensible = vc[0]
            else:
                root_count = len(alts) if ext_start < 0 else ext_start
                extensible = ext_start >= 0
            node = ("choice", alts, root_count, extensible)
        elif ops in ("SEQUENCE_OF", "SET_OF"):
            elem = conv_members()[0][1]
            node = ("seqof", elem, sc)
        elif base is not None or ops == cname:
            if base is None:
                raise RuntimeError(f"{fname}: cannot find base for {cname}")
            if base == "NativeEnumerated":
                ispec = int_specs[(fname, spec)]
                items = v2e_maps[(fname, ispec[0])]
                extension = ispec[2]
                root_count = (extension - 1) if extension else len(items)
                extensible = bool(extension) or (vc is not None and vc[0])
                node = ("enum", tuple(items), root_count, extensible)
            elif base in ("NativeInteger", "INTEGER"):
                node = ("int", vc)
            elif base in ("IA5String", "NumericString", "ObjectDescriptor",
                          "VisibleString", "UTF8String"):
                c2v = re.search(r"(permitted_alphabet_code2value_\d+)",
                                (ti.file.read_text(errors="replace")))
                if c2v and (fname, c2v.group(1)) in c2v_maps:
                    alpha = ("tab", tuple(c2v_maps[(fname, c2v.group(1))]))
                else:
                    alpha = vc
                    if alpha is None and base == "NumericString":
                        alpha = (False, 32, 57)
                node = ("charstr", alpha, sc)
            elif base == "OCTET_STRING":
                node = ("octstr", sc)
            elif base == "BIT_STRING":
                node = ("bitstr", sc)
            elif base == "GraphicString":
                node = ("octstr", sc)
            elif base == "NULL":
                node = ("null",)
            elif base == "BOOLEAN":
                node = ("bool",)
            elif base == "OBJECT_IDENTIFIER":
                node = ("oid",)
            elif base == "RELATIVE_OID":
                node = ("roid",)
            elif base == "ANY":
                node = ("any",)
            elif base in stem_of or (fname, base) in descs:
                # subtype of another schema type (e.g. AP-title-form1
                # ::= Name): alias with own constraints
                if (fname, base) in descs:
                    bgname = emit(fname, base)
                else:
                    bgname = emit(stem_of[base], base)
                node = ("alias", bgname, vc, sc)
            else:
                raise RuntimeError(f"{fname}: unknown base {base}")
        else:
            raise RuntimeError(f"{fname}: unknown ops {ops} for {cname}")
        out_types[gname] = node
        return gname

    for root in ROOTS:
        fname = stem_of.get(root)
        if fname is None:
            raise SystemExit(f"root type {root} not found")
        emit(fname, root)

    missing = [k for k, v in out_types.items() if v is None]
    if missing:
        raise SystemExit(f"unresolved emission: {missing}")

    # Post-pass: DEFAULT values for enum-typed members must be stored in
    # decoded-value form (the label), or encode-side canonical
    # suppression of default-valued members can never match.
    def terminal(ref):
        while True:
            node = out_types.get(ref)
            if node is None:
                return None
            if node[0] == "alias":
                ref = node[1]
                continue
            return node

    for gname, node in list(out_types.items()):
        if node[0] != "seq":
            continue
        new_members = []
        changed = False
        for (name, tref, optional, mcs, dfl) in node[1]:
            if dfl is not None:
                t = terminal(tref)
                if t is not None and t[0] == "enum":
                    label = next((lbl for val, lbl in t[1] if val == dfl),
                                 dfl)
                    if label != dfl:
                        dfl, changed = label, True
            new_members.append((name, tref, optional, mcs, dfl))
        if changed:
            out_types[gname] = ("seq", tuple(new_members), node[2])

    # ----------------------------------------------------------- write
    lines = [
        '"""ICAO ATN B1 message-set schema tables (machine-generated).',
        "",
        "Generated by tools/gen_asn1_tables.py from the asn1c output of",
        "the ICAO Doc 9705/9880 ATN B1 modules (reference: src/asn1/).",
        "Do not edit by hand; regenerate instead.",
        '"""',
        "from .ir import make_schema",
        "",
        "TYPES = {",
    ]
    for name in sorted(out_types):
        lines.append(f"    {name!r}: {out_types[name]!r},")
    lines.append("}")
    lines.append("")
    lines.append("SCHEMA = make_schema(TYPES)")
    lines.append("")
    OUT.write_text("\n".join(lines))
    print(f"wrote {OUT}: {len(out_types)} types from {len(files)} files")


if __name__ == "__main__":
    main()
