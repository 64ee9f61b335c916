"""HNAP (Home Network Administration Protocol) poll connector.

Re-implements the public HNAP1 challenge/response auth + status-poll
behavior of the reference exporter (reference ``mb8600.py:138-259``,
``:313-360``) as pure, injectable functions:

- key derivation / auth headers are pure functions of their inputs (the
  clock is a parameter, not a global), so they are known-answer testable;
- the transport is a plain callable ``post(url, headers, cookies, body)
  -> dict`` — production wires urllib/requests, tests wire a fake modem;
- nothing here imports pyspark: the connector is driver-side control
  plane. The Spark-facing transform (payload JSON -> docsis rows) lives
  in ``streaming/ingest.py``.

Auth scheme (reference behavior, ``mb8600.py:138-187``):

    private_key   = HMAC_MD5(public_key + password, challenge)  hex upper
    login_passwd  = HMAC_MD5(private_key, challenge)            hex upper
    HNAP_AUTH     = HMAC_MD5(private_key, millis + soap_uri) + " " + millis
    millis        = epoch_ms % 2_000_000_000_000

Security note: the reference disables TLS verification
(``mb8600.py:263-265``); this connector does NOT replicate that — the
transport owns TLS policy and verification defaults to on.
"""

from __future__ import annotations

import hashlib
import hmac
import time
from dataclasses import dataclass, field
from typing import Callable, Mapping

HNAP_URI_BASE = "http://purenetworks.com/HNAP1/"

# The five status sub-requests combined into one round trip
# (reference mb8600.py:340-348).
STATUS_SUBREQUESTS = (
    "GetMotoStatusStartupSequence",
    "GetMotoStatusConnectionInfo",
    "GetMotoStatusDownstreamChannelInfo",
    "GetMotoStatusUpstreamChannelInfo",
    "GetMotoStatusSoftware",
)

Transport = Callable[[str, Mapping[str, str], Mapping[str, str], dict], dict]
Clock = Callable[[], float]


def hmac_md5_upper(key: str, message: str) -> str:
    """Uppercase hex HMAC-MD5 — the HNAP primitive."""
    return hmac.new(key.encode(), message.encode(), hashlib.md5).hexdigest().upper()


def private_key(public_key: str, password: str, challenge: str) -> str:
    """Session private key (reference mb8600.py:138-151)."""
    return hmac_md5_upper(f"{public_key}{password}", challenge)


def login_password(priv_key: str, challenge: str) -> str:
    """Derived login password (reference mb8600.py:153-166)."""
    return hmac_md5_upper(priv_key, challenge)


def auth_millis(clock: Clock = time.time) -> int:
    """Wrapped epoch-millis used in HNAP_AUTH (reference mb8600.py:173-174)."""
    return int(clock() * 1000) % 2_000_000_000_000


def hnap_auth_header(
    soap_action: str,
    priv_key: str = "withoutloginkey",
    clock: Clock = time.time,
) -> str:
    """Time-keyed HNAP_AUTH header (reference mb8600.py:168-187).
    Regenerated per request because it embeds the clock."""
    millis = auth_millis(clock)
    digest = hmac_md5_upper(priv_key, f"{millis}{HNAP_URI_BASE}{soap_action}")
    return f"{digest} {millis}"


def status_request_body() -> dict:
    """The combined GetMultipleHNAPs poll body (reference mb8600.py:340-348)."""
    return {"GetMultipleHNAPs": {sub: "" for sub in STATUS_SUBREQUESTS}}


@dataclass
class HnapSession:
    """Two-phase HNAP login + authenticated polling against one modem.

    State mirrors the reference's session dict (mb8600.py:38-44,
    227-233). ``transport`` performs one HTTP POST and returns the
    decoded JSON body (the reference must decode with an overridden
    content type because the modem serves JSON as text/html,
    mb8600.py:351 — that quirk belongs to the transport).
    """

    base_url: str
    username: str
    password: str
    transport: Transport
    clock: Clock = time.time
    state: dict = field(default_factory=dict)

    @property
    def _hnap_url(self) -> str:
        return f"{self.base_url}/HNAP1/"

    def _headers(self, soap_action: str, priv_key: str = "withoutloginkey") -> dict:
        return {
            "Hnap_auth": hnap_auth_header(soap_action, priv_key, self.clock),
            "Soapaction": f"{HNAP_URI_BASE}{soap_action}",
        }

    def login(self) -> None:
        """Challenge request -> key derivation -> keyed login
        (reference mb8600.py:189-259)."""
        challenge_resp = self.transport(
            self._hnap_url,
            self._headers("Login"),
            {},
            {
                "Login": {
                    "Action": "request",
                    "Username": self.username,
                    "LoginPassword": "",
                    "Captcha": "",
                    "PrivateLogin": "LoginPassword",
                }
            },
        )["LoginResponse"]
        challenge = challenge_resp["Challenge"]
        cookie = challenge_resp["Cookie"]
        pub = challenge_resp["PublicKey"]

        priv = private_key(pub, self.password, challenge)
        pwd = login_password(priv, challenge)
        self.state = {
            "challenge": challenge,
            "uid": cookie,
            "public_key": pub,
            "private_key": priv,
            "login_password": pwd,
        }

        result = self.transport(
            self._hnap_url,
            self._headers("Login", priv),
            {"uid": cookie, "PrivateKey": priv},
            {
                "Login": {
                    "Action": "login",
                    "Username": self.username,
                    "LoginPassword": pwd,
                    "Captcha": "",
                    "PrivateLogin": "LoginPassword",
                }
            },
        )
        if result["LoginResponse"]["LoginResult"] != "OK":
            raise PermissionError("HNAP login rejected (bad credentials)")

    def poll_status(self) -> dict:
        """One authenticated GetMultipleHNAPs poll; re-login + retry once
        when the session expired (reference's status gate,
        mb8600.py:354-360)."""
        if not self.state:
            self.login()
        for attempt in (0, 1):
            resp = self.transport(
                self._hnap_url,
                self._headers("GetMultipleHNAPs", self.state["private_key"]),
                {"uid": self.state["uid"], "PrivateKey": self.state["private_key"]},
                status_request_body(),
            )
            envelope = resp.get("GetMultipleHNAPsResponse", {})
            if envelope.get("GetMultipleHNAPsResult") == "OK":
                return resp
            if attempt == 0:
                self.login()
        raise ConnectionError("HNAP status poll failed after re-login")
