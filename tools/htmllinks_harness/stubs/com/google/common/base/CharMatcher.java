package com.google.common.base;

/** Guava CharMatcher stub: only noneOf(...).retainFrom(...) as used by
 *  LinkParser.getUrl (strip whitespace from hrefs). */
public final class CharMatcher {
    private final String rejected;

    private CharMatcher(String rejected) {
        this.rejected = rejected;
    }

    public static CharMatcher noneOf(String chars) {
        return new CharMatcher(chars);
    }

    public String retainFrom(CharSequence seq) {
        StringBuilder sb = new StringBuilder(seq.length());
        for (int i = 0; i < seq.length(); i++) {
            char c = seq.charAt(i);
            if (rejected.indexOf(c) < 0) sb.append(c);
        }
        return sb.toString();
    }
}
