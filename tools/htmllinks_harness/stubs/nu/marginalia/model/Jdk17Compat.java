package nu.marginalia.model;

/** JDK-21 String.indexOf(ch, from, to) backport for the JDK-17 build of
 *  the reference sources (used only via a mechanical call-site rewrite of
 *  a temp copy of EdgeUrl.java in run_diff.py — the reference itself is
 *  never modified). */
public final class Jdk17Compat {
    public static int indexOf(String s, char ch, int beginIndex, int endIndex) {
        for (int i = beginIndex; i < endIndex; i++) {
            if (s.charAt(i) == ch) return i;
        }
        return -1;
    }
}
