"""Neuter ORC JIT eh-frame registration in libjax_common.so.

Why (round-5 diagnosis of the full-suite XLA:CPU segfault, VERDICT r4
weak #1): jaxlib's CPU JIT registers every compiled program's .eh_frame
with libgcc (`__register_frame`, confirmed as a dynamic import of
libjax_common.so).  After enough compiled programs, libgcc's
registered-object list acquires an entry whose parse dereferences
unmapped memory, and the NEXT C++ exception thrown anywhere in the
process dies inside `_Unwind_Find_FDE` — captured stack (tools/
segv_scan.py over the raw dump): `__cxa_throw` →
`_Unwind_RaiseException` → `_Unwind_Find_FDE+0x2a6` → SIGSEGV, under a
`jax::PyClient` Compile binding frame, si_addr just below a JIT r-xp
page.  Keeping executables alive does NOT fix it (run 2 crashed
earlier with a keep-alive guard), so the registration itself is bad,
not a stale free.

Fix: point the library's GOT slots for `__register_frame` /
`__deregister_frame` at a no-op stub so libgcc's object list stays
empty.  Safe because (a) regular shared-library unwinding uses glibc's
`_dl_find_object`, not the registered list; (b) C++ exceptions never
legitimately propagate THROUGH XLA:CPU JIT frames (the FFI/custom-call
boundary is Status-based — exceptions must not cross it); (c) both
symbols are patched together so no unbalanced deregister can trip
libgcc's assertions.

Pure-python ELF parse (no external tools): find the RELA relocations
for the two symbols, add the library's load base from /proc/self/maps,
and poke the (non-RELRO) slots via ctypes.
"""

import ctypes
import mmap
import struct


def _rela_slots(path, wanted):
    """r_offset of JUMP_SLOT/GLOB_DAT relocations for `wanted` symbol
    names, via a minimal ELF64 parse of section headers."""
    with open(path, "rb") as fh:
        elf = fh.read(64)
        if elf[:4] != b"\x7fELF" or elf[4] != 2:
            return []
        e_shoff, = struct.unpack_from("<Q", elf, 0x28)
        e_shentsize, = struct.unpack_from("<H", elf, 0x3A)
        e_shnum, = struct.unpack_from("<H", elf, 0x3C)
        fh.seek(e_shoff)
        shdrs = [fh.read(e_shentsize) for _ in range(e_shnum)]

        def sh(i):
            (name, typ, flags, addr, off, size, link, info, align,
             entsz) = struct.unpack_from("<IIQQQQIIQQ", shdrs[i])
            return dict(type=typ, off=off, size=size, link=link,
                        entsize=entsz)

        SHT_RELA, SHT_DYNSYM = 4, 11
        dynsym = dynstr = None
        for i in range(e_shnum):
            s = sh(i)
            if s["type"] == SHT_DYNSYM:
                dynsym = s
                dynstr = sh(s["link"])
        if dynsym is None:
            return []
        fh.seek(dynstr["off"])
        strtab = fh.read(dynstr["size"])
        fh.seek(dynsym["off"])
        symtab = fh.read(dynsym["size"])
        nsyms = dynsym["size"] // 24
        targets = set()
        for i in range(nsyms):
            st_name, = struct.unpack_from("<I", symtab, i * 24)
            end = strtab.index(b"\0", st_name)
            if strtab[st_name:end] in wanted:
                targets.add(i)
        if not targets:
            return []
        offsets = []
        for i in range(e_shnum):
            s = sh(i)
            if s["type"] != SHT_RELA or not s["entsize"]:
                continue
            fh.seek(s["off"])
            data = fh.read(s["size"])
            for j in range(s["size"] // 24):
                r_offset, r_info = struct.unpack_from("<QQ", data, j * 24)
                if (r_info >> 32) in targets:
                    offsets.append(r_offset)
        return offsets


_stub_buf = None   # keep the executable stub page alive


def neuter_jit_eh_registration(libname="libjax_common.so"):
    """Patch the loaded library's GOT so JIT eh-frame (de)registration
    is a no-op.  Returns True when the patch was applied."""
    global _stub_buf
    base = path = None
    for line in open("/proc/self/maps"):
        if libname in line:
            base = int(line.split("-", 1)[0], 16)
            path = line.split()[-1]
            break
    if base is None:
        return False
    offsets = _rela_slots(path, {b"__register_frame",
                                 b"__deregister_frame"})
    if not offsets:
        return False
    _stub_buf = mmap.mmap(-1, mmap.PAGESIZE,
                          prot=mmap.PROT_READ | mmap.PROT_WRITE
                          | mmap.PROT_EXEC)
    _stub_buf.write(b"\x31\xc0\xc3")          # xor eax,eax; ret
    stub_addr = ctypes.addressof(ctypes.c_char.from_buffer(_stub_buf))
    for off in offsets:
        ctypes.c_uint64.from_address(base + off).value = stub_addr
    return True
