package org.jsoup.nodes;

import java.util.Locale;
import java.util.Map;

/** Minimal jsoup Element stub for the LinkParser differential harness.
 *  Holds a flat (tag, attrs) pair from the Python tokenizer's element
 *  stream; attribute lookup is case-insensitive with absent -> "" like
 *  jsoup's Attributes.getIgnoreCase. */
public class Element {
    public final String tagName;
    private final Map<String, String> attrs;

    public Element(String tagName, Map<String, String> attrs) {
        this.tagName = tagName.toLowerCase(Locale.ROOT);
        this.attrs = attrs;
    }

    public String attr(String key) {
        return attrs.getOrDefault(key.toLowerCase(Locale.ROOT), "");
    }

    public String html() {
        return "";
    }
}
