"""Host-name model: (sub_domain, top_domain) split.

Reimplements the reference's ``EdgeDomain`` semantics
(ref: code/common/model/java/nu/marginalia/model/EdgeDomain.java:16-112):

- lowercase the host, strip trailing dots;
- split on the second-to-last dot into sub + top domain;
- gov-style two-level TLDs (``.co.uk``, ``.ac.jp``, …) captured by a
  regex over the final 7 chars having ≥2 dots;
- IPv4 hosts are never split.

Equality/hashing is by (sub_domain, top_domain) — i.e. by normalized address.
"""

from __future__ import annotations

import re
from functools import lru_cache

_GOV_TLD_RE = re.compile(r".*\.(id|ac|co|org|gov|edu|com)\.[a-z]{2}\Z")
_IP_RE = re.compile(r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\Z")


def _looks_like_gov_tld(host: str) -> bool:
    if len(host) < 8:
        return False
    if host[-7:].count(".") < 2:
        return False
    return _GOV_TLD_RE.match(host) is not None


def _looks_like_ip(host: str) -> bool:
    if len(host) < 7:
        return False
    return host[0].isdigit() and host[-1].isdigit() and _IP_RE.match(host) is not None


@lru_cache(maxsize=65536)
def split_host(host: str) -> tuple[str, str]:
    """host → (sub_domain, top_domain), both lowercase."""
    host = host.lower()
    while host and not host.isspace() and host.endswith("."):
        host = host[:-1]

    dot = host.rfind(".")
    if dot < 0 or _looks_like_ip(host):
        return "", host

    dot2 = host.rfind(".", 0, dot)
    if dot2 < 0:
        return "", host

    if _looks_like_gov_tld(host):
        dot3 = host.rfind(".", 0, dot2)
        if dot3 >= 0:
            return host[:dot3], host[dot3 + 1 :]
        return "", host

    return host[:dot2], host[dot2 + 1 :]


class EdgeDomain:
    __slots__ = ("sub_domain", "top_domain")

    def __init__(self, host: str):
        self.sub_domain, self.top_domain = split_host(host)

    @property
    def address(self) -> str:
        if self.sub_domain:
            return f"{self.sub_domain}.{self.top_domain}"
        return self.top_domain

    def __str__(self) -> str:
        return self.address

    def __repr__(self) -> str:
        return f"EdgeDomain({self.address!r})"

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, EdgeDomain)
            and self.sub_domain == other.sub_domain
            and self.top_domain == other.top_domain
        )

    def __hash__(self) -> int:
        return hash((self.sub_domain, self.top_domain))


def top_domain_of(host: str) -> str:
    return split_host(host)[1]
