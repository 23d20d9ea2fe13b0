"""Media advisory, OHMA, and MIAM-dispatch ACARS application tests."""
import base64
import json
import zlib

from dumpvdl2_tpu.proto.acars_apps import (decode_acars_apps,
                                           media_adv_parse, ohma_parse)
from dumpvdl2_tpu.proto.base import JsonObj, TextOut


def _text(node) -> str:
    out = TextOut()
    node.format_text(out, 0)
    return out.getvalue()


def test_media_adv_established():
    node = media_adv_parse("0EV121314/S2")
    assert node is not None
    txt = _text(node)
    assert "Link established: VHF ACARS at 12:13:14 UTC" in txt
    assert "Satellite" in txt and "VDL2" in txt
    obj = JsonObj()
    node.format_json(obj)
    assert obj["link_status"] == "established"
    assert obj["available_links"] == ["Satellite", "VDL2"]


def test_media_adv_lost_and_garbage():
    node = media_adv_parse("0L2030405")
    assert node is not None
    assert "Link lost: VDL2 at 03:04:05 UTC" in _text(node)
    assert media_adv_parse("random text") is None
    assert media_adv_parse("0EVabcdef") is None   # non-numeric time


def test_ohma_roundtrip():
    doc = {"systemId": "ENG1", "status": [1, 2, 3], "msg": "ok"}
    payload = base64.b64encode(
        zlib.compress(json.dumps(doc).encode())).decode()
    node = ohma_parse("OHMA" + payload)
    assert node is not None and not node.error, node.error
    assert node.doc == doc
    assert "systemId" in _text(node)


def test_ohma_jws_envelope():
    doc = {"v": 1}
    inner = base64.urlsafe_b64encode(json.dumps(doc).encode()) \
        .decode().rstrip("=")
    jws = "eyJhbGciOiJub25lIn0." + inner + ".sig"
    payload = base64.b64encode(zlib.compress(jws.encode())).decode()
    node = ohma_parse("OHMA" + payload)
    assert node is not None and not node.error, node.error
    assert node.doc == doc


def test_ohma_bad_payload_graceful():
    node = ohma_parse("OHMA%%%%%")
    assert node is not None
    assert node.error or node.doc is None


def test_miam_is_fully_decoded_now():
    """MIAM single transfers decode end to end (details in test_miam.py)."""
    from dumpvdl2_tpu.proto.miam import (CorePdu, ENC_ISO5,
                                         encode_single_transfer)
    pdu = CorePdu(version=1, app_id="H1", encoding=ENC_ISO5,
                  body=b"hello miam")
    node = decode_acars_apps("MA", encode_single_transfer(pdu))
    txt = _text(node)
    assert "Single Transfer" in txt
    core = node.next
    assert core is not None and core.pdu.crc_ok
    assert core.pdu.body == b"hello miam"
    obj = JsonObj()
    node.format_json(obj)
    assert obj["decoded"] is True


def test_dispatch_by_label():
    assert decode_acars_apps("SA", "0EV121314/S").json_key == "media_adv"
    assert decode_acars_apps("MA", "Y03").json_key == "miam"
    assert decode_acars_apps("H1", "plaintext") is None
    doc = base64.b64encode(zlib.compress(b'{"a":1}')).decode()
    assert decode_acars_apps("H1", "OHMA" + doc).json_key == "ohma"
