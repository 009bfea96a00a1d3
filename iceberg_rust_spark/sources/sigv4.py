"""AWS Signature Version 4 request signing, from the published spec.

Counterpart of the credential/signing layer the reference's Glue and
S3Tables catalogs get from the AWS SDK (crates/catalog/glue/src/utils.rs:56
``create_sdk_config`` wires region + access key + secret + session token;
the SDK signs every request with SigV4). Implemented here directly over
the public algorithm (docs.aws.amazon.com sigv4-create-canonical-request):

  canonical = METHOD \\n uri \\n query \\n canon-headers \\n signed \\n sha256(body)
  scope     = <yyyymmdd>/<region>/<service>/aws4_request
  to-sign   = AWS4-HMAC-SHA256 \\n <amz-date> \\n scope \\n sha256(canonical)
  key       = HMAC*("AWS4"+secret, yyyymmdd, region, service, "aws4_request")
  signature = hex(HMAC(key, to-sign))

Both the client (glue.py / s3tables.py) and the in-process test endpoints
use this module — the fakes RE-DERIVE the signature from the raw request
and reject mismatches, so the client's canonicalization is actually
exercised, not assumed.
"""

from __future__ import annotations

import datetime
import hashlib
import hmac
import urllib.parse
from typing import Dict, Optional, Tuple

ALGORITHM = "AWS4-HMAC-SHA256"


def _hmac(key: bytes, msg: str) -> bytes:
    return hmac.new(key, msg.encode("utf-8"), hashlib.sha256).digest()


def _sha256_hex(data: bytes) -> str:
    return hashlib.sha256(data).hexdigest()


def _uri_encode(part: str, *, encode_slash: bool) -> str:
    safe = "-_.~" + ("" if encode_slash else "/")
    return urllib.parse.quote(part, safe=safe)


def canonical_request(method: str, path: str, query: str,
                      headers: Dict[str, str], signed_headers: Tuple[str, ...],
                      payload: bytes) -> str:
    # query: sort by key then value, both URI-encoded
    pairs = urllib.parse.parse_qsl(query, keep_blank_values=True)
    enc = sorted((_uri_encode(k, encode_slash=True),
                  _uri_encode(v, encode_slash=True)) for k, v in pairs)
    canon_query = "&".join(f"{k}={v}" for k, v in enc)
    lower = {k.lower(): " ".join(v.split()) for k, v in headers.items()}
    canon_headers = "".join(f"{h}:{lower[h].strip()}\n"
                            for h in signed_headers)
    return "\n".join([
        method.upper(),
        _uri_encode(path or "/", encode_slash=False),
        canon_query,
        canon_headers,
        ";".join(signed_headers),
        _sha256_hex(payload),
    ])


def signing_key(secret_key: str, date: str, region: str,
                service: str) -> bytes:
    k = _hmac(("AWS4" + secret_key).encode("utf-8"), date)
    k = _hmac(k, region)
    k = _hmac(k, service)
    return _hmac(k, "aws4_request")


def sign_request(method: str, url: str, headers: Dict[str, str],
                 payload: bytes, *, region: str, service: str,
                 access_key: str, secret_key: str,
                 session_token: Optional[str] = None,
                 now: Optional[datetime.datetime] = None) -> Dict[str, str]:
    """Return ``headers`` plus Host/X-Amz-Date/(X-Amz-Security-Token)/
    X-Amz-Content-Sha256/Authorization for the given request."""
    parsed = urllib.parse.urlsplit(url)
    t = now or datetime.datetime.now(datetime.timezone.utc)
    amz_date = t.strftime("%Y%m%dT%H%M%SZ")
    date = amz_date[:8]

    out = dict(headers)
    out["Host"] = parsed.netloc
    out["X-Amz-Date"] = amz_date
    out["X-Amz-Content-Sha256"] = _sha256_hex(payload)
    if session_token:
        out["X-Amz-Security-Token"] = session_token

    signed = tuple(sorted(k.lower() for k in out))
    canon = canonical_request(method, parsed.path, parsed.query, out,
                              signed, payload)
    scope = f"{date}/{region}/{service}/aws4_request"
    to_sign = "\n".join([ALGORITHM, amz_date, scope, _sha256_hex(
        canon.encode("utf-8"))])
    sig = hmac.new(signing_key(secret_key, date, region, service),
                   to_sign.encode("utf-8"), hashlib.sha256).hexdigest()
    out["Authorization"] = (
        f"{ALGORITHM} Credential={access_key}/{scope}, "
        f"SignedHeaders={';'.join(signed)}, Signature={sig}")
    return out


def verify_request(method: str, path: str, query: str,
                   headers: Dict[str, str], payload: bytes, *,
                   secret_key: str) -> Tuple[bool, str]:
    """Server side: re-derive the signature from the raw request and the
    shared secret; returns (ok, detail). Used by the test fakes."""
    auth = headers.get("Authorization") or headers.get("authorization")
    if not auth or not auth.startswith(ALGORITHM):
        return False, "missing SigV4 Authorization header"
    try:
        parts = dict(p.strip().split("=", 1)
                     for p in auth[len(ALGORITHM):].strip().split(","))
        credential = parts["Credential"]
        signed = tuple(parts["SignedHeaders"].split(";"))
        got_sig = parts["Signature"]
        _akid, date, region, service, _term = credential.split("/")
    except (KeyError, ValueError) as e:
        return False, f"malformed Authorization header: {e}"
    lower = {k.lower(): v for k, v in headers.items()}
    amz_date = lower.get("x-amz-date", "")
    canon = canonical_request(method, path, query, lower, signed, payload)
    scope = f"{date}/{region}/{service}/aws4_request"
    to_sign = "\n".join([ALGORITHM, amz_date, scope,
                         _sha256_hex(canon.encode("utf-8"))])
    want = hmac.new(signing_key(secret_key, date, region, service),
                    to_sign.encode("utf-8"), hashlib.sha256).hexdigest()
    if not hmac.compare_digest(want, got_sig):
        return False, f"signature mismatch (canonical={canon!r})"
    return True, "ok"
