/* LD_PRELOAD crash reporter for the XLA:CPU full-suite segfault hunt
 * (VERDICT r4 weak #1).  No gdb exists in this image, so this installs
 * SIGSEGV/SIGBUS/SIGABRT handlers on a sigaltstack (so stack OVERFLOWS
 * are reportable too) and writes si_addr, the faulting stack pointer,
 * and a glibc backtrace_symbols_fd() C-level backtrace to stderr and to
 * MFI_SEGV_LOG (default /tmp/segv_backtrace.log).
 *
 * Build:  gcc -shared -fPIC -O1 -g tools/segv_backtrace.c -o /tmp/segv_bt.so
 * Use:    LD_PRELOAD=/tmp/segv_bt.so python -m pytest ...
 *
 * Diagnostic value: if si_addr is within a page of the thread's stack
 * guard (sp), the crash is a stack overflow (8 MB default soft limit on
 * this host) rather than heap corruption.
 */
#define _GNU_SOURCE
#include <execinfo.h>
#include <fcntl.h>
#include <signal.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <ucontext.h>
#include <unistd.h>

static char g_log[256] = "/tmp/segv_backtrace.log";
/* previous handlers (e.g. pytest's faulthandler) chained after ours so
 * the Python-level traceback still prints */
static struct sigaction g_prev[32];

static void write_str(int fd, const char *s) {
    size_t n = strlen(s);
    ssize_t r = write(fd, s, n);
    (void)r;
}

static void write_hex(int fd, uint64_t v) {
    char buf[19] = "0x0000000000000000";
    static const char hexd[] = "0123456789abcdef";
    for (int i = 0; i < 16; i++)
        buf[17 - i] = hexd[(v >> (4 * i)) & 0xf];
    write_str(fd, buf);
}

static void handler(int sig, siginfo_t *si, void *uctx) {
    ucontext_t *uc = (ucontext_t *)uctx;
    int fds[2];
    fds[0] = 2;
    fds[1] = open(g_log, O_WRONLY | O_CREAT | O_APPEND, 0644);
    uint64_t sp = 0, pc = 0;
#if defined(__x86_64__)
    sp = (uint64_t)uc->uc_mcontext.gregs[REG_RSP];
    pc = (uint64_t)uc->uc_mcontext.gregs[REG_RIP];
#elif defined(__aarch64__)
    sp = (uint64_t)uc->uc_mcontext.sp;
    pc = (uint64_t)uc->uc_mcontext.pc;
#endif
    for (int i = 0; i < 2; i++) {
        int fd = fds[i];
        if (fd < 0) continue;
        write_str(fd, "\n=== segv_backtrace: signal ");
        write_str(fd, sig == SIGSEGV ? "SIGSEGV" :
                      sig == SIGBUS ? "SIGBUS" :
                      sig == SIGABRT ? "SIGABRT" : "?");
        write_str(fd, " si_addr=");
        write_hex(fd, (uint64_t)(uintptr_t)si->si_addr);
        write_str(fd, " sp=");
        write_hex(fd, sp);
        write_str(fd, " pc=");
        write_hex(fd, pc);
        /* |si_addr - sp| < 64KB strongly suggests stack overflow */
        uint64_t a = (uint64_t)(uintptr_t)si->si_addr;
        uint64_t d = a > sp ? a - sp : sp - a;
        write_str(fd, d < (64u << 10) ? "  [NEAR SP: stack overflow?]\n"
                                      : "  [far from sp]\n");
    }
    /* Poor-man's backtrace FIRST (async-signal-safe, no unwinder):
     * dump raw stack words above sp plus /proc/self/maps; offline, any
     * stack value that lands in an r-xp mapping is a candidate return
     * address.  Needed because the real crash site is INSIDE the libgcc
     * unwinder (holding its object mutex), so backtrace() deadlocks. */
    {
        int fd = open(g_log, O_WRONLY | O_CREAT | O_APPEND, 0644);
        if (fd >= 0) {
            write_str(fd, "--- stack words (sp..sp+32KB) ---\n");
            uint64_t *p = (uint64_t *)(sp & ~7ull);
            for (int i = 0; i < 4096; i++) {
                /* stop at the guard: probe via a bounds check against
                 * the altstack-independent assumption that stacks are
                 * < 64MB; unmapped reads here would re-fault, so limit
                 * to the page the kernel says is mapped: msync probe */
                if (((uint64_t)(p + i) & 0xFFF) == 0) {
                    /* new page: probe with mincore-free trick -- write
                     * syscall returns EFAULT on unmapped source */
                    ssize_t r = write(fd, (const void *)(p + i), 1);
                    if (r < 0) break;
                    write_str(fd, "\n");
                }
                write_hex(fd, p[i]);
                write_str(fd, (i & 3) == 3 ? "\n" : " ");
            }
            write_str(fd, "\n--- /proc/self/maps ---\n");
            int mf = open("/proc/self/maps", O_RDONLY);
            if (mf >= 0) {
                char buf[4096];
                ssize_t n2;
                while ((n2 = read(mf, buf, sizeof(buf))) > 0) {
                    ssize_t r = write(fd, buf, n2);
                    (void)r;
                }
                close(mf);
            }
            write_str(fd, "--- end maps ---\n");
            close(fd);
        }
    }
    /* backtrace() may still deadlock (see above) -- watchdog it */
    signal(SIGALRM, SIG_DFL);
    alarm(20);
    void *frames[64];
    int n = backtrace(frames, 64);
    for (int i = 0; i < 2; i++) {
        if (fds[i] < 0) continue;
        backtrace_symbols_fd(frames, n, fds[i]);
        write_str(fds[i], "=== end backtrace ===\n");
        if (fds[i] > 2) close(fds[i]);
    }
    /* chain to the previously-installed handler (pytest faulthandler
     * prints the Python traceback and re-raises with SIG_DFL) */
    if (sig < 32 && (g_prev[sig].sa_flags & SA_SIGINFO) &&
        g_prev[sig].sa_sigaction) {
        g_prev[sig].sa_sigaction(sig, si, uctx);
        return;
    }
    signal(sig, SIG_DFL);
    raise(sig);
}

static void install_one(int sig) {
    struct sigaction sa;
    memset(&sa, 0, sizeof(sa));
    sa.sa_sigaction = handler;
    sa.sa_flags = SA_SIGINFO | SA_ONSTACK;
    sigaction(sig, &sa, sig < 32 ? &g_prev[sig] : NULL);
    /* don't chain to ourselves on reinstall */
    if (sig < 32 && g_prev[sig].sa_sigaction == handler)
        memset(&g_prev[sig], 0, sizeof(g_prev[sig]));
}

/* call from Python (ctypes) AFTER pytest's faulthandler registers, so
 * our C backtrace prints first and then chains to the Python one */
void segv_bt_reinstall(void) {
    install_one(SIGSEGV);
    install_one(SIGBUS);
    install_one(SIGABRT);
}

/* per-thread altstack so a stack-overflow SIGSEGV on this thread is
 * still reportable; call from any thread that might overflow */
void segv_bt_thread_altstack(void) {
    stack_t ss;
    ss.ss_sp = malloc(256 * 1024);
    ss.ss_size = 256 * 1024;
    ss.ss_flags = 0;
    if (ss.ss_sp) sigaltstack(&ss, NULL);
}

__attribute__((constructor)) static void install(void) {
    const char *p = getenv("MFI_SEGV_LOG");
    if (p && strlen(p) < sizeof(g_log) - 1)
        strcpy(g_log, p);
    segv_bt_thread_altstack();
    segv_bt_reinstall();
}
