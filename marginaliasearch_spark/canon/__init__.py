"""URL canonicalization kernel — the identity function of the crawler.

Reproduces (bit-for-bit, verified by golden vectors) the reference's URL
normalization and 64-bit URL-seen hash:

- ``murmur``       : MurmurHash3 x64-128 over UTF-16 low bytes, seeded with
                     Java ``String.hashCode()``, folded to 64 bits
                     (ref: third-party/commons-codec/.../MurmurHash3_128.java:56-175)
- ``domain``       : host → (sub_domain, top_domain) split
                     (ref: code/common/model/.../EdgeDomain.java:16-91)
- ``queryparams``  : query-param whitelist + sort
                     (ref: code/common/model/.../util/QueryParams.java:14-92)
- ``url``          : lenient parse + urlencode repair + normalization
                     (ref: code/common/model/.../EdgeUrl.java:213-467)
- ``linkparser``   : relative-URL resolution + link relevance
                     (ref: code/processes/crawling-process/ft-link-parser/.../LinkParser.java)
"""

from .domain import EdgeDomain
from .murmur import hash_nearly_ascii, hash_url_parts, java_string_hashcode
from .queryparams import query_params_sanitizer
from .url import EdgeUrl, parse_url

__all__ = [
    "EdgeDomain",
    "EdgeUrl",
    "parse_url",
    "hash_nearly_ascii",
    "hash_url_parts",
    "java_string_hashcode",
    "query_params_sanitizer",
]
