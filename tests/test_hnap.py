"""HNAP connector tests: key-derivation known answers and the two-phase
login + poll flow against a fake modem transport."""

from __future__ import annotations

import hashlib
import hmac as hmac_lib

import pytest

from mb8600_clickhouse_spark.sources import hnap


class TestKeyDerivation:
    def test_private_key_known_answer(self):
        # independently derived: HMAC_MD5(key="PUBKEYpass", msg="CHAL")
        want = (
            hmac_lib.new(b"PUBKEYpass", b"CHAL", hashlib.md5).hexdigest().upper()
        )
        assert hnap.private_key("PUBKEY", "pass", "CHAL") == want
        assert hnap.private_key("PUBKEY", "pass", "CHAL").isupper()

    def test_login_password_chains_private_key(self):
        priv = hnap.private_key("PK", "pw", "CH")
        want = hmac_lib.new(priv.encode(), b"CH", hashlib.md5).hexdigest().upper()
        assert hnap.login_password(priv, "CH") == want

    def test_auth_header_shape_and_time_wrap(self):
        clock = lambda: 3_000_000_000.5  # noqa: E731 — epoch-s beyond the wrap point
        header = hnap.hnap_auth_header("Login", "KEY", clock)
        digest, millis = header.split(" ")
        assert len(digest) == 32 and digest.isupper()
        # millis wraps mod 2e12 (reference mb8600.py:173-174)
        assert int(millis) == (3_000_000_000_500 % 2_000_000_000_000)
        want = hmac_lib.new(
            b"KEY",
            f"{millis}http://purenetworks.com/HNAP1/Login".encode(),
            hashlib.md5,
        ).hexdigest().upper()
        assert digest == want

    def test_default_key_without_login(self):
        header = hnap.hnap_auth_header("Login", clock=lambda: 1000.0)
        assert " " in header  # uses the "withoutloginkey" default


class FakeModem:
    """Minimal HNAP1 endpoint: challenge -> keyed login -> status."""

    CHALLENGE = "abc123CHALLENGE"
    PUBLIC_KEY = "deadbeefPUBKEY"
    COOKIE = "uid-42"

    def __init__(self, password: str, payload: dict):
        self.password = password
        self.payload = payload
        self.logins = 0
        self.expire_next = False

    def __call__(self, url, headers, cookies, body):
        assert url.endswith("/HNAP1/")
        assert "Hnap_auth" in headers and "Soapaction" in headers
        if "Login" in body:
            login = body["Login"]
            if login["Action"] == "request":
                return {
                    "LoginResponse": {
                        "Challenge": self.CHALLENGE,
                        "Cookie": self.COOKIE,
                        "PublicKey": self.PUBLIC_KEY,
                    }
                }
            priv = hnap.private_key(self.PUBLIC_KEY, self.password, self.CHALLENGE)
            want_pwd = hnap.login_password(priv, self.CHALLENGE)
            ok = login["LoginPassword"] == want_pwd and cookies.get("uid") == self.COOKIE
            self.logins += 1
            return {"LoginResponse": {"LoginResult": "OK" if ok else "FAILED"}}
        if self.expire_next:
            self.expire_next = False
            return {"GetMultipleHNAPsResponse": {"GetMultipleHNAPsResult": "EXPIRED"}}
        assert body == hnap.status_request_body()
        return self.payload


STATUS_PAYLOAD = {
    "GetMultipleHNAPsResponse": {
        "GetMultipleHNAPsResult": "OK",
        "GetMotoStatusDownstreamChannelInfoResponse": {
            "MotoConnDownstreamChannel": "1^Locked^QAM256^3^495.0^1.5^43.2^17^4^x"
        },
    }
}


class TestSession:
    def _session(self, modem):
        return hnap.HnapSession(
            base_url="https://192.168.100.1",
            username="admin",
            password="hunter2",
            transport=modem,
            clock=lambda: 1700000000.0,
        )

    def test_login_derives_and_stores_state(self):
        modem = FakeModem("hunter2", STATUS_PAYLOAD)
        s = self._session(modem)
        s.login()
        assert s.state["uid"] == FakeModem.COOKIE
        assert s.state["private_key"] == hnap.private_key(
            FakeModem.PUBLIC_KEY, "hunter2", FakeModem.CHALLENGE
        )
        assert modem.logins == 1

    def test_wrong_password_rejected(self):
        modem = FakeModem("correct", STATUS_PAYLOAD)
        s = self._session(modem)
        s.password = "wrong"
        with pytest.raises(PermissionError):
            s.login()

    def test_poll_logs_in_lazily_and_returns_payload(self):
        modem = FakeModem("hunter2", STATUS_PAYLOAD)
        s = self._session(modem)
        assert s.poll_status() == STATUS_PAYLOAD
        assert modem.logins == 1

    def test_poll_relogins_on_expired_session(self):
        modem = FakeModem("hunter2", STATUS_PAYLOAD)
        s = self._session(modem)
        s.login()
        modem.expire_next = True  # status gate (mb8600.py:354-360)
        assert s.poll_status() == STATUS_PAYLOAD
        assert modem.logins == 2
