"""Build the reference G.729A decoder as a test oracle binary.

Compiles /root/reference/G.729/g729a_native.c (read-only reference, not
vendored) together with our small driver into /tmp, so differential tests
can validate bit-exactness.  Skipped when the reference tree is absent.
"""

import os
import subprocess
import tempfile

REF = "/root/reference/G.729/g729a_native.c"
REF_HDR_DIR = "/root/reference/G.729"

DRIVER = r"""
#include <stdio.h>
#include <stdint.h>
#include <string.h>
extern void* g729a_decoder_init();
extern int g729a_decode_frame(void* avctx, int16_t* serial, int serial_size,
                              int16_t* out_frame, int out_frame_size);
int main(void){
    uint8_t buf[10];
    int16_t serial[82];
    int16_t pcm[80];
    void* ctx = g729a_decoder_init();
    while (fread(buf, 1, 10, stdin) == 10) {
        serial[0] = 0x6b21; serial[1] = 80;
        for (int i = 0; i < 80; i++)
            serial[2+i] = ((buf[i>>3] >> (7-(i&7))) & 1) ? 0x81 : 0x7f;
        g729a_decode_frame(ctx, serial, 0, pcm, 80);
        fwrite(pcm, 2, 80, stdout);
    }
    return 0;
}
"""

COMPAT = r"""
#ifndef G729_COMPAT_H
#define G729_COMPAT_H
static inline int av_log2(unsigned int v){int n=0; if(!v) return 0; while(v>>=1) n++; return n;}
#define FFABS(a) ((a) >= 0 ? (a) : (-(a)))
static inline int av_clip(int a,int amin,int amax){if(a<amin)return amin;if(a>amax)return amax;return a;}
static inline short av_clip_int16(int a){if((a+32768)&~65535)return (a>>31)^32767;return a;}
#endif
"""


def build_oracle():
    """Returns path to the oracle binary, or None if unavailable."""
    if not os.path.exists(REF):
        return None
    out = os.path.join(tempfile.gettempdir(), "g729_oracle_test")
    if os.path.exists(out):
        return out
    d = tempfile.mkdtemp()
    drv = os.path.join(d, "driver.c")
    compat = os.path.join(d, "compat.h")
    open(drv, "w").write(DRIVER)
    open(compat, "w").write(COMPAT)
    try:
        subprocess.run(
            ["gcc", "-O1", "-fwrapv", "-DNDEBUG", "-DG729A_NATIVE",
             "-I", REF_HDR_DIR, "-include", compat, "-o", out, REF, drv, "-lm"],
            check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    return out
