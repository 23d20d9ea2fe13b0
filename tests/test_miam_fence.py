"""Adversarial fence around the reconstructed MIAM CORE codec.

proto/miam.py's CORE wire format is this framework's own documented
reconstruction (the real ARINC 841 spec is unavailable here — reference
boundary: /root/reference/src/acars.c:100-114 hands MIAM to libacars).
These tests pin the safety property that makes the reconstruction
honest: NON-conforming input (anything not produced by our own
encoder) must degrade to a labeled error + raw-text dump, and must
NEVER yield a wrong-but-plausible field decode.  Operators can also
disable the codec entirely with --miam off.
"""
import random
import string
import zlib

import pytest

from dumpvdl2_tpu.config import Config, reset_config
from dumpvdl2_tpu.proto import miam
from dumpvdl2_tpu.proto.base import JsonObj, TextOut
from dumpvdl2_tpu.proto.miam import CorePdu, decode_core, encode_core, miam_parse


def _render(node):
    """Formatting an adversarial parse must never raise."""
    out = TextOut()
    node.format_text(out, 0)
    obj = JsonObj()
    node.format_json(obj)
    return out.getvalue()


def _adversarial_corpus():
    rng = random.Random(0xA841)
    corpus = []
    printable = string.ascii_letters + string.digits + string.punctuation
    # 1. random printable text (libacars-era MIAM does not use our
    #    armoring alphabet exclusively, so most real traffic looks
    #    like this to our dearmor)
    corpus += ["".join(rng.choices(printable, k=rng.randint(1, 220)))
               for _ in range(50)]
    # 2. base64/deflate blobs mimicking real MIAM-over-ACARS bodies —
    #    base64's alphabet is a SUBSET of our base-85 alphabet, so
    #    these often dearmor successfully and must die on the CRC
    import base64
    for i in range(50):
        blob = bytes(rng.getrandbits(8) for _ in range(rng.randint(4, 160)))
        if i % 2:
            blob = zlib.compress(blob)
        corpus.append(base64.b64encode(blob).decode())
    # 3. truncated / bit-flipped armoring of GENUINE encodes
    genuine = encode_core(CorePdu(app_id="H1", msg_num=7,
                                  body=b"genuine payload " * 4))
    corpus += [genuine[:k] for k in range(1, len(genuine), 7)]
    alpha = miam._B85_ALPHABET
    for _ in range(40):
        i = rng.randrange(len(genuine))
        repl = alpha[(alpha.index(genuine[i]) + 1 + rng.randrange(83))
                     % len(alpha)]
        corpus.append(genuine[:i] + repl + genuine[i + 1:])
    # 4. armoring-alphabet-only random strings (dearmor usually works,
    #    CRC must reject)
    corpus += ["".join(rng.choices(alpha, k=rng.randint(5, 200)))
               for _ in range(50)]
    return corpus


def test_decode_core_never_plausibly_decodes_garbage():
    genuine = encode_core(CorePdu(app_id="H1", msg_num=7,
                                  body=b"genuine payload " * 4))
    for text in _adversarial_corpus():
        if text == genuine:
            continue
        pdu = decode_core(text)
        # the fence: every non-conforming input must carry an error --
        # fields from a failed CRC are never presented as a decode
        assert pdu.error, f"plausible decode of garbage: {text!r}"
        assert pdu.raw_text == text
        node = miam.MiamCoreNode(pdu)
        rendered = _render(node)
        assert "-- " in rendered                    # labeled error
        if len(text) <= 512:
            assert text in rendered                 # raw text shown


def test_miam_parse_adversarial_frames_never_raise():
    rng = random.Random(7)
    printable = string.ascii_letters + string.digits + string.punctuation
    for ftype in "TFKSAYX":
        for _ in range(60):
            txt = ftype + "".join(
                rng.choices(printable, k=rng.randint(0, 200)))
            node = miam_parse(txt, reg="XX-ADV")
            if node is not None:
                _render(node)
    # non-frame first characters parse to None (handed back raw)
    assert miam_parse("zzz") is None
    assert miam_parse("") is None


def test_segment_reassembly_of_garbage_degrades_labeled():
    """A file transfer whose reassembled content is garbage must end in
    the labeled error path, not a plausible CORE decode."""
    class Ctx:                                      # bare reasm context
        pass
    ctx = Ctx()
    reg = ".TEST"
    n1 = miam_parse("F01%06d20260101000000" % 10, reg=reg, reasm_ctx=ctx,
                    rx_time=0.0)
    assert n1 is not None and not n1.err
    n2 = miam_parse("S01001" + "NotOurArmor!"[:10], reg=reg,
                    reasm_ctx=ctx, rx_time=1.0)
    assert n2 is not None
    if n2.reassembled and n2.next is not None:
        assert n2.next.pdu.error
        _render(n2)


def test_miam_off_gate():
    from dumpvdl2_tpu.proto.acars_apps import decode_acars_apps
    genuine = "T" + encode_core(CorePdu(app_id="H1", body=b"x"))
    try:
        Config.miam = "off"
        assert decode_acars_apps("MA", genuine) is None
        Config.miam = "auto"
        node = decode_acars_apps("MA", genuine)
        assert node is not None and node.next is not None
        assert not node.next.pdu.error
    finally:
        reset_config()


def test_cli_flag_surface():
    from dumpvdl2_tpu.app.cli import build_parser
    p = build_parser()
    args = p.parse_args(["--miam", "off", "--iq-file", "x"])
    assert args.miam == "off"
    assert p.parse_args(["--iq-file", "x"]).miam == "auto"
    with pytest.raises(SystemExit):
        p.parse_args(["--miam", "bogus", "--iq-file", "x"])
