package org.apache.commons.lang3;

import java.util.ArrayList;
import java.util.List;

/** commons-lang3 StringUtils stub: only the two methods EdgeUrl /
 *  QueryParams use.  split(str, ch) follows commons semantics — adjacent
 *  separators are treated as one, no empty tokens, null -> null. */
public final class StringUtils {
    public static boolean isEmpty(CharSequence cs) {
        return cs == null || cs.length() == 0;
    }

    public static String[] split(String str, char separator) {
        if (str == null) return null;
        List<String> out = new ArrayList<>();
        int start = -1;
        for (int i = 0; i < str.length(); i++) {
            if (str.charAt(i) == separator) {
                if (start >= 0) {
                    out.add(str.substring(start, i));
                    start = -1;
                }
            } else if (start < 0) {
                start = i;
            }
        }
        if (start >= 0) out.add(str.substring(start));
        return out.toArray(new String[0]);
    }
}
