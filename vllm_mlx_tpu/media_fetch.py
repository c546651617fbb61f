# SPDX-License-Identifier: Apache-2.0
"""Remote media fetching with SSRF protection (reference
models/mllm.py:483-560 ``_validate_url_safety`` /
``_request_with_safe_redirects``).

Policy: only http/https; the resolved address of EVERY hop (including
each redirect target) must be public — loopback, private (RFC 1918),
link-local, CGNAT, multicast, reserved, and unspecified ranges are
rejected; redirects are followed manually with a hop cap and each hop is
re-validated; responses are size-capped while streaming.
"""

from __future__ import annotations

import ipaddress
import logging
import socket
import urllib.error
import urllib.parse
import urllib.request
from dataclasses import dataclass
from typing import Optional

logger = logging.getLogger(__name__)

MAX_IMAGE_BYTES = 20 * 1024 * 1024
MAX_VIDEO_BYTES = 200 * 1024 * 1024
MAX_AUDIO_BYTES = 50 * 1024 * 1024
MAX_REDIRECTS = 3
_BLOCKED_HOSTNAMES = {"localhost", "metadata.google.internal"}


class UnsafeRemoteURLError(ValueError):
    """Raised when a remote media URL fails the SSRF policy."""


@dataclass
class FetchPolicy:
    allow_remote: bool = False  # opt-in (--allow-remote-media)
    max_bytes: int = MAX_IMAGE_BYTES
    timeout: float = 30.0
    allow_private: bool = False  # tests / trusted intranets only


def _addr_is_public(ip: str) -> bool:
    try:
        a = ipaddress.ip_address(ip)
    except ValueError:
        return False
    return not (
        a.is_private
        or a.is_loopback
        or a.is_link_local
        or a.is_multicast
        or a.is_reserved
        or a.is_unspecified
        or (a.version == 4 and a in ipaddress.ip_network("100.64.0.0/10"))
    )


def validate_url_safety(
    url: str, policy: Optional[FetchPolicy] = None
) -> Optional[str]:
    """Reject URLs whose scheme or resolved address could reach internal
    services (reference models/mllm.py:483 ``_validate_url_safety``).

    Returns the validated public IP so the caller can PIN the connection
    to it — re-resolving at connect time would reopen the classic DNS
    rebinding hole (validate public, connect private). None when the
    policy allows private hosts (no pinning needed)."""
    policy = policy or FetchPolicy()
    parsed = urllib.parse.urlparse(url)
    if parsed.scheme not in ("http", "https"):
        raise UnsafeRemoteURLError(f"scheme {parsed.scheme!r} not allowed")
    host = parsed.hostname
    if not host:
        raise UnsafeRemoteURLError("URL has no host")
    if host.lower() in _BLOCKED_HOSTNAMES:
        raise UnsafeRemoteURLError(f"host {host!r} is blocked")
    if policy.allow_private:
        return None
    try:
        infos = socket.getaddrinfo(host, parsed.port or 0, proto=socket.IPPROTO_TCP)
    except socket.gaierror as e:
        raise UnsafeRemoteURLError(f"cannot resolve {host!r}: {e}") from e
    ips = []
    for info in infos:
        ip = info[4][0]
        if not _addr_is_public(ip):
            raise UnsafeRemoteURLError(
                f"host {host!r} resolves to non-public address {ip}"
            )
        ips.append(ip)
    return ips[0] if ips else None


def fetch_url(url: str, policy: Optional[FetchPolicy] = None) -> bytes:
    """Fetch remote media with per-hop SSRF validation, a redirect cap,
    and streaming size enforcement. Returns the raw content bytes."""
    policy = policy or FetchPolicy()
    if not policy.allow_remote:
        raise UnsafeRemoteURLError(
            "remote media fetching is disabled "
            "(start the server with --allow-remote-media)"
        )
    current = url
    for _ in range(MAX_REDIRECTS + 1):
        ip = validate_url_safety(current, policy)
        resp = _fetch_once(current, ip, policy)
        try:
            if resp.status in (301, 302, 303, 307, 308):
                loc = resp.getheader("Location")
                if not loc:
                    raise UnsafeRemoteURLError("redirect without Location")
                current = urllib.parse.urljoin(current, loc)
                continue
            if resp.status != 200:
                raise ValueError(f"fetch failed: HTTP {resp.status}")
            clen = resp.getheader("Content-Length")
            if clen and int(clen) > policy.max_bytes:
                raise ValueError(
                    f"remote media exceeds {policy.max_bytes} bytes"
                )
            chunks = []
            total = 0
            while True:
                chunk = resp.read(1 << 20)
                if not chunk:
                    break
                total += len(chunk)
                if total > policy.max_bytes:
                    raise ValueError(
                        f"remote media exceeds {policy.max_bytes} bytes"
                    )
                chunks.append(chunk)
            return b"".join(chunks)
        finally:
            resp.close()
    raise UnsafeRemoteURLError(f"too many redirects (> {MAX_REDIRECTS})")


def _fetch_once(url: str, ip: Optional[str], policy: FetchPolicy):
    """One GET, CONNECTED TO THE VALIDATED IP (TLS SNI/verification
    still against the original hostname) so a rebinding DNS name cannot
    swap in a private address between validation and connect. Returns an
    http.client response (not auto-redirecting)."""
    import http.client
    import ssl

    parsed = urllib.parse.urlparse(url)
    host = parsed.hostname
    port = parsed.port or (443 if parsed.scheme == "https" else 80)
    connect_host = ip or host

    if parsed.scheme == "https":
        ctx = ssl.create_default_context()

        class _Pinned(http.client.HTTPSConnection):
            def connect(self) -> None:  # pragma: no cover - network
                raw = socket.create_connection(
                    (connect_host, port), timeout=policy.timeout
                )
                self.sock = ctx.wrap_socket(raw, server_hostname=host)

        conn: http.client.HTTPConnection = _Pinned(
            host, port, timeout=policy.timeout, context=ctx
        )
    else:

        class _PinnedHTTP(http.client.HTTPConnection):
            def connect(self) -> None:  # pragma: no cover - network
                self.sock = socket.create_connection(
                    (connect_host, port), timeout=policy.timeout
                )

        conn = _PinnedHTTP(host, port, timeout=policy.timeout)

    path = parsed.path or "/"
    if parsed.query:
        path += "?" + parsed.query
    conn.request(
        "GET", path,
        headers={"Host": host, "User-Agent": "vllm-mlx-tpu/1.0"},
    )
    return conn.getresponse()


def resolve_media_source(
    src, policy: Optional[FetchPolicy] = None
):
    """If ``src`` is a remote URL, fetch it under the SSRF policy and
    return the raw bytes; anything else passes through unchanged."""
    if isinstance(src, str) and src.startswith(("http://", "https://")):
        return fetch_url(src, policy)
    return src
