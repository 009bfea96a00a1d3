"""Wire-protocol layers in isolation: SigV4 against AWS's published test
vector, sign/verify round-trips, and Thrift strict-binary codec round-trips
over every type combination (hypothesis)."""

import hashlib
import hmac

from hypothesis import given, settings
from hypothesis import strategies as st

from iceberg_rust_spark.sources import sigv4, thrift_proto as tp


def test_sigv4_aws_published_vector():
    """The ListUsers/IAM example from the AWS SigV4 documentation: known
    canonical-request hash and final signature."""
    headers = {"content-type":
               "application/x-www-form-urlencoded; charset=utf-8",
               "host": "iam.amazonaws.com",
               "x-amz-date": "20150830T123600Z"}
    signed = ("content-type", "host", "x-amz-date")
    canon = sigv4.canonical_request(
        "GET", "/", "Action=ListUsers&Version=2010-05-08", headers, signed,
        b"")
    assert sigv4._sha256_hex(canon.encode()) == \
        "f536975d06c0309214f805bb90ccff089219ecd68b2577efef23edd43b7e1a59"
    to_sign = "\n".join([
        sigv4.ALGORITHM, "20150830T123600Z",
        "20150830/us-east-1/iam/aws4_request",
        sigv4._sha256_hex(canon.encode())])
    key = sigv4.signing_key("wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
                            "20150830", "us-east-1", "iam")
    sig = hmac.new(key, to_sign.encode(), hashlib.sha256).hexdigest()
    assert sig == ("5d672d79c15b13162d9279b0855cfba6"
                   "789a8edb4c82c400e06b5924a6f2b5d7")


def test_sigv4_sign_verify_roundtrip():
    headers = sigv4.sign_request(
        "POST", "http://127.0.0.1:9000/?b=2&a=1", {"X-Amz-Target": "X.Op"},
        b'{"k": "v"}', region="eu-central-1", service="glue",
        access_key="AKID", secret_key="sekrit")
    ok, detail = sigv4.verify_request(
        "POST", "/", "b=2&a=1", headers, b'{"k": "v"}', secret_key="sekrit")
    assert ok, detail
    # tampered body fails
    ok2, _ = sigv4.verify_request(
        "POST", "/", "b=2&a=1", headers, b'{"k": "X"}', secret_key="sekrit")
    assert not ok2
    # wrong secret fails
    ok3, _ = sigv4.verify_request(
        "POST", "/", "b=2&a=1", headers, b'{"k": "v"}', secret_key="other")
    assert not ok3


def _roundtrip(struct_fields):
    msg = tp.encode_message("m", tp.CALL, 7, struct_fields)
    pos = [0]

    def rd(k):
        b = msg[pos[0]:pos[0] + k]
        pos[0] += k
        return b
    name, mtype, seqid, payload = tp.Reader(rd).message()
    assert (name, mtype, seqid) == ("m", tp.CALL, 7)
    return payload


def test_thrift_scalar_and_container_roundtrip():
    fields = {
        1: (tp.BOOL, True),
        2: (tp.I32, -123456),
        3: (tp.I64, 2**60),
        4: (tp.STRING, "héllo ✓"),
        5: (tp.DOUBLE, 3.5),
        6: (tp.LIST, (tp.STRING, ["a", "b", ""])),
        7: (tp.MAP, (tp.STRING, tp.I32, {"x": 1, "y": -2})),
        8: (tp.STRUCT, {1: (tp.STRING, "nested"),
                        2: (tp.LIST, (tp.I64, [1, 2, 3]))}),
    }
    got = _roundtrip(fields)
    assert got[1] == (tp.BOOL, True)
    assert got[2] == (tp.I32, -123456)
    assert got[3] == (tp.I64, 2**60)
    assert got[4] == (tp.STRING, "héllo ✓")
    assert got[5] == (tp.DOUBLE, 3.5)
    assert got[6] == (tp.LIST, (tp.STRING, ["a", "b", ""]))
    assert got[7][1][2] == {"x": 1, "y": -2}
    assert got[8][1][1] == (tp.STRING, "nested")


def test_thrift_none_fields_skipped():
    """None-valued optional fields are simply not written (IDL optional)."""
    got = _roundtrip({1: (tp.STRING, "a"), 2: (tp.STRING, None)})
    assert 1 in got and 2 not in got


@settings(max_examples=50, deadline=None)
@given(st.dictionaries(
    st.integers(min_value=1, max_value=200),
    st.one_of(
        st.tuples(st.just(tp.I32),
                  st.integers(-2**31, 2**31 - 1)),
        st.tuples(st.just(tp.I64),
                  st.integers(-2**63, 2**63 - 1)),
        st.tuples(st.just(tp.STRING), st.text(max_size=40)),
        st.tuples(st.just(tp.BOOL), st.booleans()),
        st.tuples(st.just(tp.LIST),
                  st.tuples(st.just(tp.STRING),
                            st.lists(st.text(max_size=10), max_size=5))),
    ),
    max_size=12))
def test_thrift_property_roundtrip(fields):
    assert _roundtrip(fields) == fields
