package com.google.common.base;

public final class Strings {
    public static boolean isNullOrEmpty(String s) {
        return s == null || s.isEmpty();
    }
}
