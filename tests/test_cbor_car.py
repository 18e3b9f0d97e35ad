import io

import pytest

from convdr_tpu.etl.cbor_car import (
    CarParagraph,
    decode_item,
    encode_item,
    iter_paragraphs,
)


def roundtrip(obj):
    return decode_item(io.BytesIO(encode_item(obj)))


def test_roundtrip_scalars():
    for obj in (0, 23, 24, 255, 65536, -1, -100, "hello", b"bytes", True,
                False, None, [], [1, [2, "x"]]):
        assert roundtrip(obj) == obj


def test_decode_known_vectors():
    # RFC 8949 appendix A vectors
    assert decode_item(io.BytesIO(bytes.fromhex("00"))) == 0
    assert decode_item(io.BytesIO(bytes.fromhex("1903e8"))) == 1000
    assert decode_item(io.BytesIO(bytes.fromhex("20"))) == -1
    assert decode_item(io.BytesIO(bytes.fromhex("6161"))) == "a"
    assert decode_item(io.BytesIO(bytes.fromhex("83010203"))) == [1, 2, 3]
    # indefinite-length text string "streaming"
    assert (
        decode_item(io.BytesIO(bytes.fromhex("7f657374726561646d696e67ff")))
        == "streaming"
    )
    # tagged item: tag 0 wrapping a string
    assert decode_item(io.BytesIO(bytes.fromhex("c074323031332d30332d32315432303a30343a30305a"))) == "2013-03-21T20:04:00Z"


def test_paragraph_get_text():
    para = CarParagraph(
        para_id="abc",
        bodies=[[0, "Hello "], [1, "Page", "page-id", "world"], [0, "!"]],
    )
    assert para.get_text() == "Hello world!"


def test_iter_paragraphs_stream():
    buf = io.BytesIO()
    # optional header item then two paragraphs
    buf.write(encode_item([0, "header"]))
    buf.write(encode_item([1, "id1", [[0, "first paragraph"]]]))
    buf.write(encode_item([1, b"id2", [[0, "second "], [1, "P", "pid", "link"]]]))
    buf.seek(0)
    paras = list(iter_paragraphs(buf))
    assert [p.para_id for p in paras] == ["id1", "id2"]
    assert paras[0].get_text() == "first paragraph"
    assert paras[1].get_text() == "second link"


def test_truncated_stream():
    data = encode_item([1, "id1", [[0, "text"]]])
    with pytest.raises(EOFError):
        decode_item(io.BytesIO(data[: len(data) - 2]))
