package org.slf4j;

public class Logger {
    public void debug(String fmt, Object... args) {}
    public void warn(String fmt, Object... args) {}
    public void info(String fmt, Object... args) {}
    public void error(String fmt, Object... args) {}
}
