import pytest

from openbts_ttsou_tpu.sms import messages as sms


def test_7bit_packing_round_trip():
    for text in ("hello", "hellohello world 1234567", "a", "", "abcdefgh"):
        packed = sms.pack_7bit(text)
        assert len(packed) == (len(text) * 7 + 7) // 8
        assert sms.unpack_7bit(packed, len(text)) == text


def test_7bit_known_vector():
    # "hellohello" is the classic GSM 03.38 example: E8329BFD4697D9EC37
    assert sms.pack_7bit("hellohello").hex().upper() == \
        "E8329BFD4697D9EC37"


def test_address_round_trip():
    for digits in ("2125551212", "911", "123456789012345"):
        enc = sms.encode_address(digits)
        dec, off = sms.decode_address(enc, 0)
        assert dec == digits
        assert off == len(enc)


def test_tl_submit_round_trip():
    t = sms.TLSubmit(mr=7, dest="18005551212", text="test message")
    data = t.encode()
    back = sms.TLSubmit.parse(data)
    assert back.mr == 7
    assert back.dest == "18005551212"
    assert back.text == "test message"


def test_tl_deliver_round_trip():
    import datetime

    t = sms.TLDeliver(orig="411", text="incoming!",
                      timestamp=datetime.datetime(2009, 6, 15, 12, 30, 45))
    back = sms.TLDeliver.parse(t.encode())
    assert back.orig == "411"
    assert back.text == "incoming!"


def test_rp_data_round_trip():
    tpdu = sms.TLSubmit(mr=1, dest="911", text="sos").encode()
    rp = sms.RPData(reference=9, dest="170", tpdu=tpdu, mo=True)
    back = sms.parse_rp(rp.encode())
    assert isinstance(back, sms.RPData)
    assert back.reference == 9 and back.mo
    assert back.dest == "170"
    inner = sms.TLSubmit.parse(back.tpdu)
    assert inner.text == "sos"


def test_rp_ack_error():
    ack = sms.parse_rp(sms.RPAck(reference=5, mo=False).encode())
    assert isinstance(ack, sms.RPAck) and ack.reference == 5
    err = sms.parse_rp(sms.RPError(reference=3, cause=38).encode())
    assert isinstance(err, sms.RPError) and err.cause == 38


def test_cp_layer_round_trip():
    rpdu = sms.RPData(reference=1, tpdu=b"\x01\x02", mo=True).encode()
    cp = sms.CPData(ti=2, rpdu=rpdu)
    back = sms.parse_cp(cp.encode())
    assert isinstance(back, sms.CPData)
    assert back.ti == 2 and back.rpdu == rpdu
    ack = sms.parse_cp(sms.CPAck(ti=2).encode())
    assert isinstance(ack, sms.CPAck) and ack.ti == 2
    err = sms.parse_cp(sms.CPError(ti=1, cause=95).encode())
    assert isinstance(err, sms.CPError) and err.cause == 95


def test_mo_sms_full_stack():
    """MS composes SUBMIT → RP-DATA → CP-DATA; network unwraps each
    layer (the MOSMSController path, SMSControl.cpp:301)."""
    tl = sms.TLSubmit(mr=0, dest="2125551212", text="hi from the MS")
    rp = sms.RPData(reference=1, dest="170", tpdu=tl.encode(), mo=True)
    cp = sms.CPData(ti=5, rpdu=rp.encode())
    wire = cp.encode()
    # network side
    cp2 = sms.parse_cp(wire)
    rp2 = sms.parse_rp(cp2.rpdu)
    tl2 = sms.TLSubmit.parse(rp2.tpdu)
    assert tl2.text == "hi from the MS"
    assert tl2.dest == "2125551212"
    assert rp2.dest == "170"


def test_gsm_charset():
    from openbts_ttsou_tpu.sms.messages import (
        GSM_BASIC_CHARSET,
        decode_gsm_chars,
        encode_gsm_chars,
    )

    assert len(GSM_BASIC_CHARSET) == 128
    assert GSM_BASIC_CHARSET[0x00] == "@"
    assert GSM_BASIC_CHARSET[0x20] == " "
    assert GSM_BASIC_CHARSET[0x41] == "A"
    assert GSM_BASIC_CHARSET[0x61] == "a"
    assert GSM_BASIC_CHARSET[0x5F] == "§"
    # round trip incl. extension characters
    t = "Hola £5 {x} [y] ~ | €uro"
    assert decode_gsm_chars(encode_gsm_chars(t)) == t
    # unmappable → '?'
    assert decode_gsm_chars(encode_gsm_chars("漢")) == "?"
