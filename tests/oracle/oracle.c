/* Test-only ground-truth oracle.
 *
 * Binds the system libjpeg-turbo / libpng / libwebp to (a) synthesize an
 * encoded test corpus and (b) provide independent reference decodes, playing
 * the role the reference's tests give to OpenCV
 * (reference: test/extensions/common_ext_decoder_test.h:37-60 and
 * test/python/utils.py:61-72 — decode compared against OpenCV).
 *
 * This library is a TEST dependency only; the framework's own codecs never
 * call it.
 */
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <setjmp.h>

#include <jpeglib.h>
#include <png.h>
#include <webp/decode.h>
#include <webp/encode.h>

/* ---------------------------------------------------------------- common */

void oracle_free(void *p) { free(p); }

/* ------------------------------------------------------------------ jpeg */

struct jerr_mgr {
    struct jpeg_error_mgr pub;
    jmp_buf jb;
};

static void jerr_exit(j_common_ptr cinfo) {
    struct jerr_mgr *e = (struct jerr_mgr *)cinfo->err;
    longjmp(e->jb, 1);
}

/* Decode to packed 8-bit pixels; out_ch = 1 (gray) or 3 (RGB) or 4 (CMYK). */
int oracle_jpeg_decode(const uint8_t *data, size_t len, uint8_t **out,
                       int *w, int *h, int *ch, int fancy_upsampling) {
    struct jpeg_decompress_struct cinfo;
    struct jerr_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = jerr_exit;
    *out = NULL;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        free(*out);
        *out = NULL;
        return -1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, data, len);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.do_fancy_upsampling = fancy_upsampling ? TRUE : FALSE;
    if (cinfo.jpeg_color_space == JCS_GRAYSCALE)
        cinfo.out_color_space = JCS_GRAYSCALE;
    else if (cinfo.jpeg_color_space == JCS_CMYK ||
             cinfo.jpeg_color_space == JCS_YCCK)
        cinfo.out_color_space = JCS_CMYK;
    else
        cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    *w = cinfo.output_width;
    *h = cinfo.output_height;
    *ch = cinfo.output_components;
    size_t stride = (size_t)(*w) * (*ch);
    *out = (uint8_t *)malloc(stride * (*h));
    while (cinfo.output_scanline < cinfo.output_height) {
        uint8_t *row = *out + stride * cinfo.output_scanline;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

/* Dump dequantization-ready DCT coefficients, per component, in raster block
 * order (natural order within each 8x8 block). Caller passes out buffers for
 * up to 4 components; fills blocks_w/blocks_h per component. Also dumps the
 * quant table applied to each component. */
int oracle_jpeg_read_coefficients(const uint8_t *data, size_t len,
                                  int16_t **coefs /*[4]*/,
                                  int *blocks_w /*[4]*/, int *blocks_h /*[4]*/,
                                  uint16_t *quant /*[4*64]*/,
                                  int *ncomp, int *hsamp /*[4]*/, int *vsamp /*[4]*/) {
    struct jpeg_decompress_struct cinfo;
    struct jerr_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = jerr_exit;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        return -1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, data, len);
    jpeg_read_header(&cinfo, TRUE);
    jvirt_barray_ptr *barrays = jpeg_read_coefficients(&cinfo);
    if (!barrays) {
        jpeg_destroy_decompress(&cinfo);
        return -2;
    }
    *ncomp = cinfo.num_components;
    for (int c = 0; c < cinfo.num_components && c < 4; c++) {
        jpeg_component_info *comp = &cinfo.comp_info[c];
        int bw = comp->width_in_blocks, bh = comp->height_in_blocks;
        blocks_w[c] = bw;
        blocks_h[c] = bh;
        hsamp[c] = comp->h_samp_factor;
        vsamp[c] = comp->v_samp_factor;
        if (comp->quant_table)
            for (int k = 0; k < 64; k++)
                quant[c * 64 + k] = comp->quant_table->quantval[k];
        coefs[c] = (int16_t *)malloc((size_t)bw * bh * 64 * sizeof(int16_t));
        for (int by = 0; by < bh; by++) {
            JBLOCKARRAY rows = (cinfo.mem->access_virt_barray)(
                (j_common_ptr)&cinfo, barrays[c], by, 1, FALSE);
            for (int bx = 0; bx < bw; bx++)
                memcpy(coefs[c] + ((size_t)by * bw + bx) * 64, rows[0][bx],
                       64 * sizeof(int16_t));
        }
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

/* subsamp: 0=444 1=422 2=420 3=gray(input must be 1ch) 4=440 5=411 6=410 */
int oracle_jpeg_encode(const uint8_t *pix, int w, int h, int ch, int quality,
                       int subsamp, int progressive, int optimize,
                       int restart_interval,
                       uint8_t **out, size_t *outlen) {
    struct jpeg_compress_struct cinfo;
    struct jerr_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = jerr_exit;
    unsigned long sz = 0;
    *out = NULL;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_compress(&cinfo);
        return -1;
    }
    jpeg_create_compress(&cinfo);
    jpeg_mem_dest(&cinfo, out, &sz);
    cinfo.image_width = w;
    cinfo.image_height = h;
    cinfo.input_components = ch;
    cinfo.in_color_space = (ch == 1) ? JCS_GRAYSCALE : JCS_RGB;
    jpeg_set_defaults(&cinfo);
    jpeg_set_quality(&cinfo, quality, TRUE);
    if (ch == 3) {
        static const int HS[7] = {1, 2, 2, 1, 1, 4, 4};
        static const int VS[7] = {1, 1, 2, 1, 2, 1, 2};
        cinfo.comp_info[0].h_samp_factor = HS[subsamp];
        cinfo.comp_info[0].v_samp_factor = VS[subsamp];
        cinfo.comp_info[1].h_samp_factor = 1;
        cinfo.comp_info[1].v_samp_factor = 1;
        cinfo.comp_info[2].h_samp_factor = 1;
        cinfo.comp_info[2].v_samp_factor = 1;
    }
    if (progressive) jpeg_simple_progression(&cinfo);
    if (optimize) cinfo.optimize_coding = TRUE;
    cinfo.restart_interval = restart_interval;
    jpeg_start_compress(&cinfo, TRUE);
    size_t stride = (size_t)w * ch;
    while (cinfo.next_scanline < cinfo.image_height) {
        const uint8_t *row = pix + stride * cinfo.next_scanline;
        jpeg_write_scanlines(&cinfo, (JSAMPARRAY)&row, 1);
    }
    jpeg_finish_compress(&cinfo);
    jpeg_destroy_compress(&cinfo);
    *outlen = sz;
    return 0;
}

/* Arithmetic-coded (T.81 Annex K) encode; progressive optional. Returns
 * -1 if this libjpeg build lacks C_ARITH_CODING_SUPPORTED. */
int oracle_jpeg_encode_arith(const uint8_t *pix, int w, int h, int ch,
                             int quality, int subsamp, int progressive,
                             int restart_interval,
                             uint8_t **out, size_t *outlen) {
    struct jpeg_compress_struct cinfo;
    struct jerr_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = jerr_exit;
    unsigned long sz = 0;
    *out = NULL;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_compress(&cinfo);
        return -1;
    }
    jpeg_create_compress(&cinfo);
    jpeg_mem_dest(&cinfo, out, &sz);
    cinfo.image_width = w;
    cinfo.image_height = h;
    cinfo.input_components = ch;
    cinfo.in_color_space = (ch == 1) ? JCS_GRAYSCALE : JCS_RGB;
    jpeg_set_defaults(&cinfo);
    jpeg_set_quality(&cinfo, quality, TRUE);
    cinfo.arith_code = TRUE;
    if (ch == 3) {
        static const int HS[7] = {1, 2, 2, 1, 1, 4, 4};
        static const int VS[7] = {1, 1, 2, 1, 2, 1, 2};
        cinfo.comp_info[0].h_samp_factor = HS[subsamp];
        cinfo.comp_info[0].v_samp_factor = VS[subsamp];
        cinfo.comp_info[1].h_samp_factor = 1;
        cinfo.comp_info[1].v_samp_factor = 1;
        cinfo.comp_info[2].h_samp_factor = 1;
        cinfo.comp_info[2].v_samp_factor = 1;
    }
    if (progressive) jpeg_simple_progression(&cinfo);
    cinfo.restart_interval = restart_interval;
    jpeg_start_compress(&cinfo, TRUE);
    size_t stride = (size_t)w * ch;
    while (cinfo.next_scanline < cinfo.image_height) {
        const uint8_t *row = pix + stride * cinfo.next_scanline;
        jpeg_write_scanlines(&cinfo, (JSAMPARRAY)&row, 1);
    }
    jpeg_finish_compress(&cinfo);
    jpeg_destroy_compress(&cinfo);
    *outlen = sz;
    return 0;
}

/* Progressive encode with SPECTRAL-SELECTION-ONLY scans (no successive
 * approximation): DC scan (0,0) then per-component AC scans split at
 * `split` (1..split, split+1..63). Restart interval applies to every scan.
 * Exercises the Ah==0 progressive class a device entropy decoder can
 * parallelize per restart segment. */
int oracle_jpeg_encode_spectral(const uint8_t *pix, int w, int h, int ch,
                                int quality, int subsamp, int split,
                                int restart_interval,
                                uint8_t **out, size_t *outlen) {
    struct jpeg_compress_struct cinfo;
    struct jerr_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = jerr_exit;
    unsigned long sz = 0;
    *out = NULL;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_compress(&cinfo);
        return -1;
    }
    jpeg_create_compress(&cinfo);
    jpeg_mem_dest(&cinfo, out, &sz);
    cinfo.image_width = w;
    cinfo.image_height = h;
    cinfo.input_components = ch;
    cinfo.in_color_space = (ch == 1) ? JCS_GRAYSCALE : JCS_RGB;
    jpeg_set_defaults(&cinfo);
    jpeg_set_quality(&cinfo, quality, TRUE);
    if (ch == 3) {
        static const int HS[7] = {1, 2, 2, 1, 1, 4, 4};
        static const int VS[7] = {1, 1, 2, 1, 2, 1, 2};
        cinfo.comp_info[0].h_samp_factor = HS[subsamp];
        cinfo.comp_info[0].v_samp_factor = VS[subsamp];
        cinfo.comp_info[1].h_samp_factor = 1;
        cinfo.comp_info[1].v_samp_factor = 1;
        cinfo.comp_info[2].h_samp_factor = 1;
        cinfo.comp_info[2].v_samp_factor = 1;
    }
    static jpeg_scan_info scans[16];
    int ns = 0;
    /* DC scan: all components interleaved */
    scans[ns].comps_in_scan = ch;
    for (int c = 0; c < ch; c++) scans[ns].component_index[c] = c;
    scans[ns].Ss = 0; scans[ns].Se = 0; scans[ns].Ah = 0; scans[ns].Al = 0;
    ns++;
    if (split < 1) split = 5;
    if (split > 62) split = 62;
    for (int c = 0; c < ch; c++) {
        scans[ns].comps_in_scan = 1;
        scans[ns].component_index[0] = c;
        scans[ns].Ss = 1; scans[ns].Se = split;
        scans[ns].Ah = 0; scans[ns].Al = 0;
        ns++;
        scans[ns].comps_in_scan = 1;
        scans[ns].component_index[0] = c;
        scans[ns].Ss = split + 1; scans[ns].Se = 63;
        scans[ns].Ah = 0; scans[ns].Al = 0;
        ns++;
    }
    cinfo.scan_info = scans;
    cinfo.num_scans = ns;
    cinfo.restart_interval = restart_interval;
    jpeg_start_compress(&cinfo, TRUE);
    size_t stride = (size_t)w * ch;
    while (cinfo.next_scanline < cinfo.image_height) {
        const uint8_t *row = pix + stride * cinfo.next_scanline;
        jpeg_write_scanlines(&cinfo, (JSAMPARRAY)&row, 1);
    }
    jpeg_finish_compress(&cinfo);
    jpeg_destroy_compress(&cinfo);
    *outlen = sz;
    return 0;
}

/* ------------------------------------------------------------------- png */

struct png_mem_reader {
    const uint8_t *data;
    size_t len, pos;
};

static void png_mem_read(png_structp png, png_bytep out, png_size_t n) {
    struct png_mem_reader *r = (struct png_mem_reader *)png_get_io_ptr(png);
    if (r->pos + n > r->len) png_error(png, "eof");
    memcpy(out, r->data + r->pos, n);
    r->pos += n;
}

/* Decode PNG keeping bit depth (8 or 16); palette expanded to RGB.
 * bitdepth returns 8 or 16; data is big-endian for 16-bit (PNG native). */
int oracle_png_decode(const uint8_t *data, size_t len, uint8_t **out,
                      int *w, int *h, int *ch, int *bitdepth) {
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, NULL, NULL, NULL);
    png_infop info = png_create_info_struct(png);
    *out = NULL;
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, NULL);
        free(*out);
        *out = NULL;
        return -1;
    }
    struct png_mem_reader r = {data, len, 0};
    png_set_read_fn(png, &r, png_mem_read);
    png_read_info(png, info);
    png_byte color = png_get_color_type(png, info);
    png_byte depth = png_get_bit_depth(png, info);
    if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
    png_set_interlace_handling(png);
    png_read_update_info(png, info);
    *w = png_get_image_width(png, info);
    *h = png_get_image_height(png, info);
    *ch = png_get_channels(png, info);
    *bitdepth = png_get_bit_depth(png, info);
    size_t stride = png_get_rowbytes(png, info);
    *out = (uint8_t *)malloc(stride * (*h));
    png_bytep *rows = (png_bytep *)malloc(sizeof(png_bytep) * (*h));
    for (int y = 0; y < *h; y++) rows[y] = *out + stride * y;
    png_read_image(png, rows);
    free(rows);
    png_destroy_read_struct(&png, &info, NULL);
    return 0;
}

struct png_mem_writer {
    uint8_t *data;
    size_t len, cap;
};

static void png_mem_write(png_structp png, png_bytep in, png_size_t n) {
    struct png_mem_writer *wr = (struct png_mem_writer *)png_get_io_ptr(png);
    if (wr->len + n > wr->cap) {
        wr->cap = (wr->cap + n) * 2;
        wr->data = (uint8_t *)realloc(wr->data, wr->cap);
    }
    memcpy(wr->data + wr->len, in, n);
    wr->len += n;
}

static void png_mem_flush(png_structp png) { (void)png; }

/* Encode 8/16-bit gray/ga/rgb/rgba. 16-bit input big-endian. */
int oracle_png_encode(const uint8_t *pix, int w, int h, int ch, int bitdepth,
                      uint8_t **out, size_t *outlen) {
    png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING, NULL, NULL, NULL);
    png_infop info = png_create_info_struct(png);
    struct png_mem_writer wr = {NULL, 0, 0};
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_write_struct(&png, &info);
        free(wr.data);
        return -1;
    }
    png_set_write_fn(png, &wr, png_mem_write, png_mem_flush);
    int color = (ch == 1) ? PNG_COLOR_TYPE_GRAY
              : (ch == 2) ? PNG_COLOR_TYPE_GRAY_ALPHA
              : (ch == 3) ? PNG_COLOR_TYPE_RGB
                          : PNG_COLOR_TYPE_RGBA;
    png_set_IHDR(png, info, w, h, bitdepth, color, PNG_INTERLACE_NONE,
                 PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
    png_write_info(png, info);
    size_t stride = (size_t)w * ch * (bitdepth / 8);
    for (int y = 0; y < h; y++)
        png_write_row(png, (png_bytep)(pix + stride * y));
    png_write_end(png, NULL);
    png_destroy_write_struct(&png, &info);
    *out = wr.data;
    *outlen = wr.len;
    return 0;
}

/* ------------------------------------------------------------------ webp */

int oracle_webp_decode_rgba(const uint8_t *data, size_t len, uint8_t **out,
                            int *w, int *h) {
    *out = WebPDecodeRGBA(data, len, w, h);
    return *out ? 0 : -1;
}

void oracle_webp_free(void *p) { WebPFree(p); }

/* Raw YUV420 planes with optional in-loop-filter bypass (debug aid for
 * stage-isolating decoder comparisons). */
int oracle_webp_decode_yuv_nf(const uint8_t *data, size_t len, uint8_t *ybuf,
                              uint8_t *ubuf, uint8_t *vbuf, int cap, int *w,
                              int *h) {
    WebPDecoderConfig cfg;
    if (!WebPInitDecoderConfig(&cfg)) return -3;
    cfg.options.bypass_filtering = 1;
    cfg.output.colorspace = MODE_YUV;
    if (WebPGetFeatures(data, len, &cfg.input) != VP8_STATUS_OK) return -4;
    int W = cfg.input.width, H = cfg.input.height;
    int cw = (W + 1) / 2, ch = (H + 1) / 2;
    if (W * H > cap || cw * ch > cap) return -2;
    cfg.output.u.YUVA.y = ybuf;
    cfg.output.u.YUVA.y_stride = W;
    cfg.output.u.YUVA.y_size = (size_t)W * H;
    cfg.output.u.YUVA.u = ubuf;
    cfg.output.u.YUVA.u_stride = cw;
    cfg.output.u.YUVA.u_size = (size_t)cw * ch;
    cfg.output.u.YUVA.v = vbuf;
    cfg.output.u.YUVA.v_stride = cw;
    cfg.output.u.YUVA.v_size = (size_t)cw * ch;
    cfg.output.is_external_memory = 1;
    if (WebPDecode(data, len, &cfg) != VP8_STATUS_OK) return -5;
    *w = W;
    *h = H;
    return 0;
}

/* Raw YUV420 planes — the fully-specified VP8 decoder output, used to
 * validate our native VP8 decode bit-exactly before any upsampling /
 * color conversion enters the comparison. */
int oracle_webp_decode_yuv(const uint8_t *data, size_t len, uint8_t *ybuf,
                           uint8_t *ubuf, uint8_t *vbuf, int cap, int *w,
                           int *h) {
    uint8_t *u = NULL, *v = NULL;
    int stride = 0, uv_stride = 0;
    uint8_t *y = WebPDecodeYUV(data, len, w, h, &u, &v, &stride, &uv_stride);
    if (!y) return -1;
    int cw = (*w + 1) / 2, ch = (*h + 1) / 2;
    if (*w * *h > cap || cw * ch > cap) {
        WebPFree(y);
        return -2;
    }
    for (int r = 0; r < *h; ++r) memcpy(ybuf + r * *w, y + r * stride, *w);
    for (int r = 0; r < ch; ++r) {
        memcpy(ubuf + r * cw, u + r * uv_stride, cw);
        memcpy(vbuf + r * cw, v + r * uv_stride, cw);
    }
    WebPFree(y);
    return 0;
}

/* Full-config lossy encode: exercises segments, token partitions and the
 * simple loop filter — stream features the plain WebPEncodeRGB API never
 * emits (decoder-coverage aid). */
int oracle_webp_encode_rgb_adv(const uint8_t *rgb, int w, int h,
                               float quality, int segments, int partitions,
                               int filter_type, int filter_strength,
                               uint8_t **out, size_t *outlen) {
    WebPConfig cfg;
    WebPPicture pic;
    WebPMemoryWriter wr;
    if (!WebPConfigInit(&cfg) || !WebPPictureInit(&pic)) return -1;
    cfg.quality = quality;
    cfg.segments = segments;
    cfg.partitions = partitions;
    cfg.filter_type = filter_type;
    cfg.filter_strength = filter_strength;
    cfg.autofilter = 0;
    if (!WebPValidateConfig(&cfg)) return -2;
    pic.width = w;
    pic.height = h;
    pic.use_argb = 0;
    if (!WebPPictureImportRGB(&pic, rgb, w * 3)) return -3;
    WebPMemoryWriterInit(&wr);
    pic.writer = WebPMemoryWrite;
    pic.custom_ptr = &wr;
    int ok = WebPEncode(&cfg, &pic);
    WebPPictureFree(&pic);
    if (!ok) {
        WebPMemoryWriterClear(&wr);
        return -4;
    }
    *out = wr.mem;
    *outlen = wr.size;
    return 0;
}

/* RGBA encode (lossy -> VP8 + ALPH chunk, lossless -> VP8L with alpha). */
int oracle_webp_encode_rgba(const uint8_t *rgba, int w, int h, float quality,
                            int lossless, uint8_t **out, size_t *outlen) {
    if (lossless)
        *outlen = WebPEncodeLosslessRGBA(rgba, w, h, w * 4, out);
    else
        *outlen = WebPEncodeRGBA(rgba, w, h, w * 4, quality, out);
    return *outlen ? 0 : 1;
}

int oracle_webp_encode_rgb(const uint8_t *rgb, int w, int h, float quality,
                           int lossless, uint8_t **out, size_t *outlen) {
    if (lossless)
        *outlen = WebPEncodeLosslessRGB(rgb, w, h, w * 3, out);
    else
        *outlen = WebPEncodeRGB(rgb, w, h, w * 3, quality, out);
    return *outlen ? 0 : -1;
}

/* ------------------------------------------------------------------ tiff */
#include <tiffio.h>

struct tiff_mem {
    uint8_t *buf;
    toff_t len, cap, pos;
    int writable;
};

static tmsize_t tm_read(thandle_t h, void *out, tmsize_t n) {
    struct tiff_mem *m = (struct tiff_mem *)h;
    if (m->pos + n > m->len) n = m->len - m->pos;
    memcpy(out, m->buf + m->pos, n);
    m->pos += n;
    return n;
}
static tmsize_t tm_write(thandle_t h, void *in, tmsize_t n) {
    struct tiff_mem *m = (struct tiff_mem *)h;
    if (!m->writable) return 0;
    if (m->pos + n > m->cap) {
        toff_t cap = m->cap ? m->cap * 2 : 65536;
        while (cap < m->pos + n) cap *= 2;
        m->buf = realloc(m->buf, cap);
        m->cap = cap;
    }
    memcpy(m->buf + m->pos, in, n);
    m->pos += n;
    if (m->pos > m->len) m->len = m->pos;
    return n;
}
static toff_t tm_seek(thandle_t h, toff_t off, int whence) {
    struct tiff_mem *m = (struct tiff_mem *)h;
    toff_t p = whence == SEEK_SET ? off : whence == SEEK_CUR ? m->pos + off : m->len + off;
    m->pos = p;
    return p;
}
static int tm_close(thandle_t h) { (void)h; return 0; }
static toff_t tm_size(thandle_t h) { return ((struct tiff_mem *)h)->len; }

/* Encode interleaved samples. compression: 1 none, 5 lzw, 8 deflate,
 * 32773 packbits. predictor applies to lzw/deflate. planar: 1 chunky,
 * 2 separate. tile_size 0 = strips (rows_per_strip rows each). */
int oracle_tiff_encode(const uint8_t *body, int w, int h, int ch, int bd,
                       int compression, int predictor, int planar,
                       int tile_size, int rows_per_strip,
                       uint8_t **out, size_t *outlen) {
    struct tiff_mem m = {0};
    m.writable = 1;
    TIFF *tif = TIFFClientOpen("mem", "w", (thandle_t)&m, tm_read, tm_write,
                               tm_seek, tm_close, tm_size, NULL, NULL);
    if (!tif) return 1;
    TIFFSetField(tif, TIFFTAG_IMAGEWIDTH, w);
    TIFFSetField(tif, TIFFTAG_IMAGELENGTH, h);
    TIFFSetField(tif, TIFFTAG_SAMPLESPERPIXEL, ch);
    TIFFSetField(tif, TIFFTAG_BITSPERSAMPLE, bd);
    TIFFSetField(tif, TIFFTAG_SAMPLEFORMAT, SAMPLEFORMAT_UINT);
    TIFFSetField(tif, TIFFTAG_COMPRESSION, compression);
    TIFFSetField(tif, TIFFTAG_PHOTOMETRIC, ch >= 3 ? PHOTOMETRIC_RGB : PHOTOMETRIC_MINISBLACK);
    TIFFSetField(tif, TIFFTAG_PLANARCONFIG, planar);
    if (ch == 4) {
        uint16_t es = EXTRASAMPLE_UNASSALPHA;
        TIFFSetField(tif, TIFFTAG_EXTRASAMPLES, 1, &es);
    }
    if (predictor > 1) TIFFSetField(tif, TIFFTAG_PREDICTOR, predictor);
    int bytes_per = bd / 8;
    if (tile_size > 0) {
        TIFFSetField(tif, TIFFTAG_TILEWIDTH, tile_size);
        TIFFSetField(tif, TIFFTAG_TILELENGTH, tile_size);
        tmsize_t tbytes = TIFFTileSize(tif);
        uint8_t *tile = malloc(tbytes);
        int spp_iter = planar == 2 ? ch : 1;
        for (int s = 0; s < spp_iter; ++s)
          for (int ty = 0; ty < h; ty += tile_size)
            for (int tx = 0; tx < w; tx += tile_size) {
                memset(tile, 0, tbytes);
                int cpp = planar == 2 ? 1 : ch;
                for (int y = 0; y < tile_size && ty + y < h; ++y)
                    for (int x = 0; x < tile_size && tx + x < w; ++x)
                        for (int c = 0; c < cpp; ++c)
                            memcpy(tile + ((y * tile_size + x) * cpp + c) * bytes_per,
                                   body + (((toff_t)(ty + y) * w + tx + x) * ch +
                                           (planar == 2 ? s : c)) * bytes_per,
                                   bytes_per);
                if (TIFFWriteTile(tif, tile, tx, ty, 0, planar == 2 ? s : 0) < 0) {
                    free(tile); TIFFClose(tif); free(m.buf); return 2;
                }
            }
        free(tile);
    } else {
        TIFFSetField(tif, TIFFTAG_ROWSPERSTRIP, rows_per_strip > 0 ? rows_per_strip : 8);
        if (planar == 2) {
            uint8_t *row = malloc((size_t)w * bytes_per);
            for (int s = 0; s < ch; ++s)
                for (int y = 0; y < h; ++y) {
                    for (int x = 0; x < w; ++x)
                        memcpy(row + (size_t)x * bytes_per,
                               body + (((size_t)y * w + x) * ch + s) * bytes_per, bytes_per);
                    if (TIFFWriteScanline(tif, row, y, s) < 0) {
                        free(row); TIFFClose(tif); free(m.buf); return 2;
                    }
                }
            free(row);
        } else {
            for (int y = 0; y < h; ++y)
                if (TIFFWriteScanline(tif, (void *)(body + (size_t)y * w * ch * bytes_per), y, 0) < 0) {
                    TIFFClose(tif); free(m.buf); return 2;
                }
        }
    }
    TIFFClose(tif);
    *out = m.buf;
    *outlen = m.len;
    return 0;
}

/* Encode float32 samples (SampleFormat IEEE FP), optional predictor 3
 * (floating-point horizontal differencing) with LZW/Deflate. */
int oracle_tiff_encode_float(const float *body, int w, int h, int ch,
                             int compression, int predictor,
                             int rows_per_strip,
                             uint8_t **out, size_t *outlen) {
    struct tiff_mem m = {0};
    m.writable = 1;
    TIFF *tif = TIFFClientOpen("mem", "w", (thandle_t)&m, tm_read, tm_write,
                               tm_seek, tm_close, tm_size, NULL, NULL);
    if (!tif) return 1;
    TIFFSetField(tif, TIFFTAG_IMAGEWIDTH, w);
    TIFFSetField(tif, TIFFTAG_IMAGELENGTH, h);
    TIFFSetField(tif, TIFFTAG_SAMPLESPERPIXEL, ch);
    TIFFSetField(tif, TIFFTAG_BITSPERSAMPLE, 32);
    TIFFSetField(tif, TIFFTAG_SAMPLEFORMAT, SAMPLEFORMAT_IEEEFP);
    TIFFSetField(tif, TIFFTAG_COMPRESSION, compression);
    TIFFSetField(tif, TIFFTAG_PHOTOMETRIC,
                 ch >= 3 ? PHOTOMETRIC_RGB : PHOTOMETRIC_MINISBLACK);
    TIFFSetField(tif, TIFFTAG_PLANARCONFIG, 1);
    if (predictor > 1) TIFFSetField(tif, TIFFTAG_PREDICTOR, predictor);
    TIFFSetField(tif, TIFFTAG_ROWSPERSTRIP,
                 rows_per_strip > 0 ? rows_per_strip : 8);
    for (int y = 0; y < h; ++y)
        if (TIFFWriteScanline(tif, (void *)(body + (size_t)y * w * ch),
                              y, 0) < 0) {
            TIFFClose(tif); free(m.buf); return 2;
        }
    TIFFClose(tif);
    *out = m.buf;
    *outlen = m.len;
    return 0;
}

/* Encode a bilevel image (one byte per pixel, 0 = white, nonzero = black)
 * with a CCITT fax compression: 2 = MH (CCITTRLE), 3 = G3 (T4Options
 * carries 2-D/fill flags), 4 = G4. fillorder 1 (MSB) or 2 (LSB). */
int oracle_tiff_encode_fax(const uint8_t *pix, int w, int h, int compression,
                           int t4options, int fillorder, int rows_per_strip,
                           uint8_t **out, size_t *outlen) {
    struct tiff_mem m = {0};
    m.writable = 1;
    TIFF *tif = TIFFClientOpen("mem", "w", (thandle_t)&m, tm_read, tm_write,
                               tm_seek, tm_close, tm_size, NULL, NULL);
    if (!tif) return 1;
    TIFFSetField(tif, TIFFTAG_IMAGEWIDTH, w);
    TIFFSetField(tif, TIFFTAG_IMAGELENGTH, h);
    TIFFSetField(tif, TIFFTAG_SAMPLESPERPIXEL, 1);
    TIFFSetField(tif, TIFFTAG_BITSPERSAMPLE, 1);
    TIFFSetField(tif, TIFFTAG_COMPRESSION, compression);
    TIFFSetField(tif, TIFFTAG_PHOTOMETRIC, PHOTOMETRIC_MINISWHITE);
    TIFFSetField(tif, TIFFTAG_PLANARCONFIG, 1);
    TIFFSetField(tif, TIFFTAG_FILLORDER, fillorder);
    TIFFSetField(tif, TIFFTAG_ROWSPERSTRIP,
                 rows_per_strip > 0 ? rows_per_strip : h);
    if (compression == 3 && t4options)
        TIFFSetField(tif, TIFFTAG_GROUP3OPTIONS, (uint32_t)t4options);
    int rowbytes = (w + 7) / 8;
    uint8_t *row = calloc(1, rowbytes);
    for (int y = 0; y < h; ++y) {
        memset(row, 0, rowbytes);
        for (int x = 0; x < w; ++x)
            if (pix[(size_t)y * w + x]) row[x >> 3] |= 0x80u >> (x & 7);
        if (TIFFWriteScanline(tif, row, y, 0) < 0) {
            free(row); TIFFClose(tif); free(m.buf); return 2;
        }
    }
    free(row);
    TIFFClose(tif);
    *out = m.buf;
    *outlen = m.len;
    return 0;
}

/* Encode RGB (ch=3) or gray (ch=1) u8 with new-style JPEG-in-TIFF
 * (compression 7). tile_size 0 = strips. */
int oracle_tiff_encode_jpeg(const uint8_t *body, int w, int h, int ch,
                            int quality, int tile_size, int rows_per_strip,
                            uint8_t **out, size_t *outlen) {
    struct tiff_mem m = {0};
    m.writable = 1;
    TIFF *tif = TIFFClientOpen("mem", "w", (thandle_t)&m, tm_read, tm_write,
                               tm_seek, tm_close, tm_size, NULL, NULL);
    if (!tif) return 1;
    TIFFSetField(tif, TIFFTAG_IMAGEWIDTH, w);
    TIFFSetField(tif, TIFFTAG_IMAGELENGTH, h);
    TIFFSetField(tif, TIFFTAG_SAMPLESPERPIXEL, ch);
    TIFFSetField(tif, TIFFTAG_BITSPERSAMPLE, 8);
    TIFFSetField(tif, TIFFTAG_COMPRESSION, COMPRESSION_JPEG);
    TIFFSetField(tif, TIFFTAG_PHOTOMETRIC,
                 ch >= 3 ? PHOTOMETRIC_YCBCR : PHOTOMETRIC_MINISBLACK);
    TIFFSetField(tif, TIFFTAG_PLANARCONFIG, 1);
    TIFFSetField(tif, TIFFTAG_JPEGQUALITY, quality);
    if (ch >= 3) TIFFSetField(tif, TIFFTAG_JPEGCOLORMODE, JPEGCOLORMODE_RGB);
    if (tile_size > 0) {
        TIFFSetField(tif, TIFFTAG_TILEWIDTH, tile_size);
        TIFFSetField(tif, TIFFTAG_TILELENGTH, tile_size);
        tmsize_t tbytes = TIFFTileSize(tif);
        uint8_t *tile = malloc(tbytes);
        for (int ty = 0; ty < h; ty += tile_size)
            for (int tx = 0; tx < w; tx += tile_size) {
                memset(tile, 0, tbytes);
                for (int y = 0; y < tile_size && ty + y < h; ++y)
                    for (int x = 0; x < tile_size && tx + x < w; ++x)
                        memcpy(tile + ((size_t)(y * tile_size + x)) * ch,
                               body + (((size_t)(ty + y) * w + tx + x)) * ch,
                               ch);
                if (TIFFWriteTile(tif, tile, tx, ty, 0, 0) < 0) {
                    free(tile); TIFFClose(tif); free(m.buf); return 2;
                }
            }
        free(tile);
    } else {
        /* libtiff JPEG requires rows_per_strip % 8 (MCU height) == 0 */
        TIFFSetField(tif, TIFFTAG_ROWSPERSTRIP,
                     rows_per_strip > 0 ? rows_per_strip : 16);
        for (int y = 0; y < h; ++y)
            if (TIFFWriteScanline(tif, (void *)(body + (size_t)y * w * ch),
                                  y, 0) < 0) {
                TIFFClose(tif); free(m.buf); return 2;
            }
    }
    TIFFClose(tif);
    *out = m.buf;
    *outlen = m.len;
    return 0;
}

/* Decode via libtiff scanline API into interleaved natural samples. */
int oracle_tiff_decode(const uint8_t *data, size_t len, uint8_t **out,
                       int *ow, int *oh, int *och, int *obd) {
    struct tiff_mem m = {(uint8_t *)data, len, len, 0, 0};
    TIFF *tif = TIFFClientOpen("mem", "r", (thandle_t)&m, tm_read, tm_write,
                               tm_seek, tm_close, tm_size, NULL, NULL);
    if (!tif) return 1;
    uint32_t w, h;
    uint16_t ch = 1, bd = 8, planar = 1;
    TIFFGetField(tif, TIFFTAG_IMAGEWIDTH, &w);
    TIFFGetField(tif, TIFFTAG_IMAGELENGTH, &h);
    TIFFGetFieldDefaulted(tif, TIFFTAG_SAMPLESPERPIXEL, &ch);
    TIFFGetFieldDefaulted(tif, TIFFTAG_BITSPERSAMPLE, &bd);
    TIFFGetFieldDefaulted(tif, TIFFTAG_PLANARCONFIG, &planar);
    uint16_t comp = 1;
    TIFFGetFieldDefaulted(tif, TIFFTAG_COMPRESSION, &comp);
    if (comp == COMPRESSION_JPEG)  /* scanlines as RGB, not raw YCbCr */
        TIFFSetField(tif, TIFFTAG_JPEGCOLORMODE, JPEGCOLORMODE_RGB);
    int bytes_per = bd / 8;
    if (bytes_per < 1) { TIFFClose(tif); return 3; }
    uint8_t *pix = malloc((size_t)w * h * ch * bytes_per);
    if (TIFFIsTiled(tif)) {
        uint32_t tw, th;
        TIFFGetField(tif, TIFFTAG_TILEWIDTH, &tw);
        TIFFGetField(tif, TIFFTAG_TILELENGTH, &th);
        uint8_t *tile = malloc(TIFFTileSize(tif));
        int spp_iter = planar == 2 ? ch : 1;
        int cpp = planar == 2 ? 1 : ch;
        for (int s = 0; s < spp_iter; ++s)
          for (uint32_t ty = 0; ty < h; ty += th)
            for (uint32_t tx = 0; tx < w; tx += tw) {
                if (TIFFReadTile(tif, tile, tx, ty, 0, (uint16_t)s) < 0) {
                    free(tile); free(pix); TIFFClose(tif); return 2;
                }
                for (uint32_t y = 0; y < th && ty + y < h; ++y)
                    for (uint32_t x = 0; x < tw && tx + x < w; ++x)
                        for (int c = 0; c < cpp; ++c)
                            memcpy(pix + (((size_t)(ty + y) * w + tx + x) * ch +
                                          (planar == 2 ? s : c)) * bytes_per,
                                   tile + ((size_t)(y * tw + x) * cpp + c) * bytes_per,
                                   bytes_per);
            }
        free(tile);
    } else {
        tmsize_t sls = TIFFScanlineSize(tif);
        uint8_t *row = malloc(sls);
        if (planar == 2) {
            for (int s = 0; s < ch; ++s)
                for (uint32_t y = 0; y < h; ++y) {
                    if (TIFFReadScanline(tif, row, y, (uint16_t)s) < 0) {
                        free(row); free(pix); TIFFClose(tif); return 2;
                    }
                    for (uint32_t x = 0; x < w; ++x)
                        memcpy(pix + (((size_t)y * w + x) * ch + s) * bytes_per,
                               row + (size_t)x * bytes_per, bytes_per);
                }
        } else {
            for (uint32_t y = 0; y < h; ++y) {
                if (TIFFReadScanline(tif, row, y, 0) < 0) {
                    free(row); free(pix); TIFFClose(tif); return 2;
                }
                memcpy(pix + (size_t)y * w * ch * bytes_per, row, (size_t)w * ch * bytes_per);
            }
        }
        free(row);
    }
    TIFFClose(tif);
    *out = pix;
    *ow = (int)w; *oh = (int)h; *och = ch; *obd = bd;
    return 0;
}

/* ---- animated WebP (libwebpdemux WebPAnimDecoder) ----
 * Composited RGBA canvas frames — the independent oracle for
 * nvimagecodec_tpu/codecs/webp_anim.py. */
#include <webp/demux.h>

int oracle_webp_anim_decode(const uint8_t *data, size_t len, uint8_t **out,
                            int *w, int *h, int *num_frames,
                            int *durations /* cap >= frames */, int dur_cap) {
    WebPData wd = {data, len};
    WebPAnimDecoderOptions opt;
    if (!WebPAnimDecoderOptionsInit(&opt)) return -1;
    opt.color_mode = MODE_RGBA;
    WebPAnimDecoder *dec = WebPAnimDecoderNew(&wd, &opt);
    if (!dec) return -2;
    WebPAnimInfo info;
    if (!WebPAnimDecoderGetInfo(dec, &info)) { WebPAnimDecoderDelete(dec); return -3; }
    size_t fsz = (size_t)info.canvas_width * info.canvas_height * 4;
    uint8_t *buf = (uint8_t *)malloc(fsz * info.frame_count);
    if (!buf) { WebPAnimDecoderDelete(dec); return -4; }
    int i = 0, prev_ts = 0;
    while (WebPAnimDecoderHasMoreFrames(dec) && i < (int)info.frame_count) {
        uint8_t *frame; int ts;
        if (!WebPAnimDecoderGetNext(dec, &frame, &ts)) { free(buf); WebPAnimDecoderDelete(dec); return -5; }
        memcpy(buf + fsz * i, frame, fsz);
        if (durations && i < dur_cap) durations[i] = ts - prev_ts;
        prev_ts = ts;
        i++;
    }
    *out = buf;
    *w = (int)info.canvas_width;
    *h = (int)info.canvas_height;
    *num_frames = i;
    WebPAnimDecoderDelete(dec);
    return 0;
}
