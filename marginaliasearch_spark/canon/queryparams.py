"""Query-param whitelist + sort.

Reimplements the reference's ``QueryParams.queryParamsSanitizer``
(ref: code/common/model/java/nu/marginalia/util/QueryParams.java:14-92):
split the query on '&' (dropping empty tokens, like Java StringUtils.split),
keep only whitelisted params, sort survivors lexicographically, join with
'&'; empty result → None.
"""

from __future__ import annotations


def is_permitted_param(path: str, param: str) -> bool:
    if path.endswith(".cgi"):
        return True
    if path.endswith("/posting.php"):
        return False

    if param.startswith("id="):
        return True
    if param.startswith("p=") or param.startswith("f="):
        # forum post/thread ids are non-canonical; drop them on forum scripts
        if path.endswith("showthread.php") or path.endswith("viewtopic.php"):
            return False
        return True
    if param.startswith("i="):
        return True
    if param.startswith("start="):
        return True
    if param.startswith("t="):
        return True
    if param.startswith("v="):
        return True
    if param.startswith("post="):
        return True

    if path.endswith("index.php"):
        if param.startswith("showtopic=") or param.startswith("showforum="):
            return True

    if path.endswith("StoryView.py"):
        return param.startswith("project=") or param.startswith("story=")

    if param.startswith("collection="):
        return True
    if param.startswith("doc="):
        return True

    return False


def query_params_sanitizer(path: str, query: str | None) -> str | None:
    if query is None:
        return None

    if "&" in query:
        parts = [p for p in query.split("&") if p and is_permitted_param(path, p)]
        if len(parts) > 1:
            parts.sort()
        ret = "&".join(parts)
    elif is_permitted_param(path, query):
        ret = query
    else:
        return None

    if not ret.strip():
        return None
    return ret
