package crawlercommons.filters.basic;

import java.net.IDN;
import java.util.Locale;
import java.util.regex.Matcher;
import java.util.regex.Pattern;

/** crawler-commons BasicURLNormalizer stub implementing the subset the
 *  reference pipeline relies on (and that the repo's Python
 *  canon/url.py::basic_normalize mirrors): lowercase scheme and host,
 *  IDN host -> punycode, strip trailing host dots, strip default ports.
 *  Returns null on unrecoverable parse failure, like the real filter. */
public class BasicURLNormalizer {
    private static final Pattern URL_RE =
            Pattern.compile("([A-Za-z][A-Za-z0-9+.\\-]*)://([^/?#]*)(.*)", Pattern.DOTALL);

    public String filter(String url) {
        Matcher m = URL_RE.matcher(url);
        if (!m.matches()) return null;
        String scheme = m.group(1).toLowerCase(Locale.ROOT);
        String authority = m.group(2);
        String rest = m.group(3);

        String userinfo = "";
        int at = authority.lastIndexOf('@');
        if (at >= 0) {
            userinfo = authority.substring(0, at + 1);
            authority = authority.substring(at + 1);
        }

        String port = "";
        String host = authority;
        if (!host.startsWith("[")) {
            int colon = host.lastIndexOf(':');
            if (colon >= 0 && isDigits(host.substring(colon + 1))) {
                port = host.substring(colon);
                host = host.substring(0, colon);
            }
        }

        host = host.toLowerCase(Locale.ROOT);
        host = idnaHost(host);
        while (host.endsWith(".")) host = host.substring(0, host.length() - 1);

        if ((scheme.equals("http") && port.equals(":80"))
                || (scheme.equals("https") && port.equals(":443"))) {
            port = "";
        }
        return scheme + "://" + userinfo + host + port + rest;
    }

    private static boolean isDigits(String s) {
        if (s.isEmpty()) return false;
        for (int i = 0; i < s.length(); i++) {
            if (!Character.isDigit(s.charAt(i))) return false;
        }
        return true;
    }

    private static String idnaHost(String host) {
        boolean ascii = true;
        for (int i = 0; i < host.length(); i++) {
            if (host.charAt(i) > 127) { ascii = false; break; }
        }
        if (ascii) return host;
        try {
            return IDN.toASCII(host);
        } catch (IllegalArgumentException ex) {
            return host;
        }
    }
}
