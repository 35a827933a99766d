package org.slf4j;

public class LoggerFactory {
    public static Logger getLogger(Class<?> cls) {
        return new Logger();
    }

    public static Logger getLogger(String name) {
        return new Logger();
    }
}
