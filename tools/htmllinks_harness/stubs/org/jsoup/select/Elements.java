package org.jsoup.select;

import org.jsoup.nodes.Element;

import java.util.ArrayList;

public class Elements extends ArrayList<Element> {
    public Element first() {
        return isEmpty() ? null : get(0);
    }
}
