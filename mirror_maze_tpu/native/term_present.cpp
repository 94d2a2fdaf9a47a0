// Native terminal presenter + input pump — the TPU build's equivalent of
// the reference's native platform glue (window + event pump,
// `utils.rs:104-168`, `main.rs:896-937`). The per-frame host work of the
// interactive loop is (a) building the 24-bit ANSI half-block frame and
// (b) draining pending key bytes; both are implemented here in C++ and
// bound via ctypes (native/bindings.py), with the pure-Python versions
// (utils/imageio.py ansi_frame, runtime/loop.py _poll_keys) as the
// transparent fallback. Output is byte-for-byte identical to the Python
// presenter (tested in tests/test_native.py).

#include <cstdint>
#include <cstdio>
#include <cstring>

#include <sys/select.h>
#include <unistd.h>

namespace {

// Writes "<n>" (0..255) at p, returns chars written (no terminator).
inline int put_u8(char* p, unsigned v) {
    if (v >= 100) {
        p[0] = static_cast<char>('0' + v / 100);
        p[1] = static_cast<char>('0' + (v / 10) % 10);
        p[2] = static_cast<char>('0' + v % 10);
        return 3;
    }
    if (v >= 10) {
        p[0] = static_cast<char>('0' + v / 10);
        p[1] = static_cast<char>('0' + v % 10);
        return 2;
    }
    p[0] = static_cast<char>('0' + v);
    return 1;
}

inline int put_lit(char* p, const char* s) {
    const int n = static_cast<int>(strlen(s));
    memcpy(p, s, n);
    return n;
}

}  // namespace

extern "C" {

// Renders two interleaved pixel rows per character cell:
//   "\x1b[38;2;R;G;Bm\x1b[48;2;r;g;bm\xe2\x96\x80" per cell,
//   "\x1b[0m" after each row, rows joined by '\n' (none trailing).
// top/bot: [rows, cols, 3] uint8, C-contiguous. Returns the number of
// bytes written, or -1 if cap is too small (callers size cap as
// rows * (cols * 43 + 5)).
int64_t mmx_ansi_halfblocks(const uint8_t* top, const uint8_t* bot,
                            int64_t rows, int64_t cols, char* out,
                            int64_t cap) {
    // Worst case per cell: 7+3*4 + 7+3*4 + 3 = 41 bytes; +5 for
    // "\x1b[0m\n". Use 43 for slack.
    if (cap < rows * (cols * 43 + 5)) return -1;
    char* p = out;
    for (int64_t y = 0; y < rows; ++y) {
        const uint8_t* t = top + y * cols * 3;
        const uint8_t* b = bot + y * cols * 3;
        for (int64_t x = 0; x < cols; ++x) {
            p += put_lit(p, "\x1b[38;2;");
            p += put_u8(p, t[x * 3 + 0]);
            *p++ = ';';
            p += put_u8(p, t[x * 3 + 1]);
            *p++ = ';';
            p += put_u8(p, t[x * 3 + 2]);
            *p++ = 'm';
            p += put_lit(p, "\x1b[48;2;");
            p += put_u8(p, b[x * 3 + 0]);
            *p++ = ';';
            p += put_u8(p, b[x * 3 + 1]);
            *p++ = ';';
            p += put_u8(p, b[x * 3 + 2]);
            *p++ = 'm';
            p += put_lit(p, "\xe2\x96\x80");  // U+2580 upper half block
        }
        p += put_lit(p, "\x1b[0m");
        if (y + 1 < rows) *p++ = '\n';
    }
    return p - out;
}

// Drains every byte currently readable on fd without blocking (the
// reference's "drain the event queue until None" pump, `main.rs:896-904`).
// Returns the number of bytes stored (<= cap), 0 if none pending.
int64_t mmx_term_poll(int fd, char* buf, int64_t cap) {
    int64_t n = 0;
    while (n < cap) {
        fd_set rfds;
        FD_ZERO(&rfds);
        FD_SET(fd, &rfds);
        struct timeval tv = {0, 0};
        const int r = select(fd + 1, &rfds, nullptr, nullptr, &tv);
        if (r <= 0 || !FD_ISSET(fd, &rfds)) break;
        const ssize_t got = read(fd, buf + n, 1);
        if (got <= 0) break;
        n += got;
    }
    return n;
}

}  // extern "C"
