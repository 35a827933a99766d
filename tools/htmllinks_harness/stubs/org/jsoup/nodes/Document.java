package org.jsoup.nodes;

import org.jsoup.select.Elements;

import java.util.List;
import java.util.Locale;
import java.util.Map;

/** Minimal jsoup Document stub: a flat element stream in document order
 *  (the Python tokenizer's output).  getElementsByTag preserves document
 *  order like jsoup's depth-first traversal; select() supports only the
 *  one selector LinkParser/DomainCrawlFrontier use —
 *  "meta[http-equiv=refresh]" — with jsoup's trimmed case-insensitive
 *  attribute-value match (Evaluator.AttributeWithValue). */
public class Document extends Element {
    private final List<Element> stream;

    public Document(List<Element> stream) {
        super("#root", Map.of());
        this.stream = stream;
    }

    public Elements getElementsByTag(String tag) {
        String t = tag.toLowerCase(Locale.ROOT);
        Elements out = new Elements();
        for (Element e : stream) {
            if (e.tagName.equals(t)) out.add(e);
        }
        return out;
    }

    public Elements select(String query) {
        if (!query.equals("meta[http-equiv=refresh]")) {
            throw new UnsupportedOperationException(query);
        }
        Elements out = new Elements();
        for (Element e : stream) {
            if (e.tagName.equals("meta")
                    && e.attr("http-equiv").trim().equalsIgnoreCase("refresh")) {
                out.add(e);
            }
        }
        return out;
    }
}
