import nu.marginalia.link_parser.LinkParser;
import nu.marginalia.model.EdgeUrl;
import org.jsoup.nodes.Document;
import org.jsoup.nodes.Element;

import java.io.BufferedReader;
import java.io.FileReader;
import java.util.ArrayList;
import java.util.LinkedHashMap;
import java.util.List;
import java.util.Map;

/**
 * Differential harness: replays the reference's enqueueLinksFromDocument
 * (DomainCrawlFrontier.java:215-237) through the reference's own
 * LinkParser/EdgeUrl/QueryParams sources (compiled in place from
 * /root/reference — nothing copied), with jsoup/guava/slf4j/commons-lang3/
 * crawler-commons replaced by the minimal stubs in stubs/.  The element
 * stream comes from the repo's Python tokenizer so the element->links
 * pipeline is the layer under differential test.
 *
 * stdin/args: args[0] = element-stream TSV (docname \t docurl \t tag \t
 * k\x1Fv ... with \t,\n,\\ backslash-escaped); emits docname \t seq \t url
 * per enqueued link, docname \t EMPTY \t - for linkless docs, docname \t
 * ERR \t message on harness error.
 */
public class Harness {

    static String unescape(String s) {
        StringBuilder sb = new StringBuilder(s.length());
        for (int i = 0; i < s.length(); i++) {
            char c = s.charAt(i);
            if (c == '\\' && i + 1 < s.length()) {
                char n = s.charAt(++i);
                if (n == 't') sb.append('\t');
                else if (n == 'n') sb.append('\n');
                else sb.append(n);
            } else {
                sb.append(c);
            }
        }
        return sb.toString();
    }

    static String escape(String s) {
        return s.replace("\\", "\\\\").replace("\t", "\\t").replace("\n", "\\n");
    }

    public static void main(String[] args) throws Exception {
        Map<String, String> docUrls = new LinkedHashMap<>();
        Map<String, List<Element>> docs = new LinkedHashMap<>();

        try (BufferedReader in = new BufferedReader(new FileReader(args[0]))) {
            String line;
            while ((line = in.readLine()) != null) {
                if (line.isEmpty()) continue;
                String[] parts = line.split("\t", -1);
                String name = parts[0];
                docUrls.putIfAbsent(name, unescape(parts[1]));
                docs.computeIfAbsent(name, k -> new ArrayList<>());
                if (parts.length < 3 || parts[2].isEmpty()) continue; // doc marker row
                String tag = parts[2];
                Map<String, String> attrs = new LinkedHashMap<>();
                for (int i = 3; i < parts.length; i++) {
                    if (parts[i].isEmpty()) continue;
                    String[] kv = unescape(parts[i]).split("\u001f", 2);
                    attrs.putIfAbsent(kv[0], kv.length > 1 ? kv[1] : "");
                }
                docs.get(name).add(new Element(tag, attrs));
            }
        }

        LinkParser linkParser = new LinkParser();
        for (var entry : docs.entrySet()) {
            String name = entry.getKey();
            try {
                EdgeUrl docUrl = new EdgeUrl(docUrls.get(name));
                Document parsed = new Document(entry.getValue());
                List<String> out = new ArrayList<>();

                // replay of DomainCrawlFrontier.enqueueLinksFromDocument
                EdgeUrl baseUrl = linkParser.getBaseLink(parsed, docUrl);
                for (var link : parsed.getElementsByTag("a")) {
                    linkParser.parseLink(baseUrl, link).ifPresent(u -> out.add(u.toString()));
                }
                for (var link : parsed.getElementsByTag("frame")) {
                    linkParser.parseFrame(baseUrl, link).ifPresent(u -> out.add(u.toString()));
                }
                for (var meta : parsed.select("meta[http-equiv=refresh]")) {
                    linkParser.parseMetaRedirect(baseUrl, meta).ifPresent(u -> out.add(u.toString()));
                }
                for (var link : parsed.getElementsByTag("iframe")) {
                    linkParser.parseFrame(baseUrl, link).ifPresent(u -> out.add(u.toString()));
                }
                for (var link : parsed.getElementsByTag("link")) {
                    String rel = link.attr("rel");
                    if (rel.equalsIgnoreCase("next") || rel.equalsIgnoreCase("prev")) {
                        linkParser.parseLink(baseUrl, link).ifPresent(u -> out.add(u.toString()));
                    }
                }

                if (out.isEmpty()) {
                    System.out.println(name + "\tEMPTY\t-");
                } else {
                    for (int i = 0; i < out.size(); i++) {
                        System.out.println(name + "\t" + i + "\t" + escape(out.get(i)));
                    }
                }
            } catch (Exception ex) {
                System.out.println(name + "\tERR\t" + escape(String.valueOf(ex)));
            }
        }
    }
}
