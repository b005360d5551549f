/* Reference shim for cross-pinning the engine's arithmetic-JPEG codec
 * against the system libjpeg (the ITU T.81 reference lineage).
 *
 * Built ON DEMAND by the unit suite (tests skip if gcc/jpeglib are
 * absent) — never shipped, never a runtime dependency. Two modes:
 *
 *   jpegref encode <w> <h> <raw.pgm-gray-bytes >out.jpg
 *       compress the w*h grayscale raster with arith_code=TRUE
 *   jpegref coefs <in.jpg >coefs.txt
 *       entropy-decode only (jpeg_read_coefficients) and dump every
 *       quantized DCT coefficient in natural order — exact integers,
 *       so the comparison is IDCT-independent and bit-for-bit.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static int do_encode(int w, int h)
{
    struct jpeg_compress_struct cinfo;
    struct jpeg_error_mgr jerr;
    unsigned char *row;
    unsigned char *buf = NULL;
    unsigned long buflen = 0;
    int y;
    unsigned char *pixels = malloc((size_t)w * h);
    if (!pixels || fread(pixels, 1, (size_t)w * h, stdin) != (size_t)w * h)
        return 2;
    cinfo.err = jpeg_std_error(&jerr);
    jpeg_create_compress(&cinfo);
    jpeg_mem_dest(&cinfo, &buf, &buflen);
    cinfo.image_width = w;
    cinfo.image_height = h;
    cinfo.input_components = 1;
    cinfo.in_color_space = JCS_GRAYSCALE;
    jpeg_set_defaults(&cinfo);
    cinfo.arith_code = TRUE;
    jpeg_start_compress(&cinfo, TRUE);
    for (y = 0; y < h; y++) {
        row = pixels + (size_t)y * w;
        jpeg_write_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_compress(&cinfo);
    fwrite(buf, 1, buflen, stdout);
    jpeg_destroy_compress(&cinfo);
    return 0;
}

/* encodec <wblocks> <hblocks>: read wb*hb*64 little-endian int16
 * NATURAL-order coefficients from stdin, write an arithmetic-coded
 * grayscale JPEG (quant table all ones so coefficients pass through)
 * to stdout. Lets the cross tests drive the entropy coder with an
 * arbitrary, minimal decision sequence. */
static int do_encode_coefs(int wb, int hb, int rsti, int progressive)
{
    struct jpeg_compress_struct cinfo;
    struct jpeg_decompress_struct dinfo;
    struct jpeg_error_mgr jerr, derr;
    unsigned char *buf = NULL;
    unsigned long buflen = 0;
    jvirt_barray_ptr *coefs;
    size_t n = (size_t)wb * hb * DCTSIZE2;
    short *vals = malloc(n * sizeof(short));
    JDIMENSION by;
    int k;

    if (!vals || fread(vals, sizeof(short), n, stdin) != n)
        return 2;
    /* jpeg_write_coefficients needs a source decompress object's
     * virtual arrays; build a compress object directly instead. */
    cinfo.err = jpeg_std_error(&jerr);
    jpeg_create_compress(&cinfo);
    jpeg_mem_dest(&cinfo, &buf, &buflen);
    cinfo.image_width = wb * DCTSIZE;
    cinfo.image_height = hb * DCTSIZE;
    cinfo.input_components = 1;
    cinfo.in_color_space = JCS_GRAYSCALE;
    jpeg_set_defaults(&cinfo);
    cinfo.arith_code = TRUE;
    cinfo.restart_interval = (unsigned)rsti;
    if (progressive)
        jpeg_simple_progression(&cinfo);
    for (k = 0; k < DCTSIZE2; k++)
        cinfo.quant_tbl_ptrs[0]->quantval[k] = 1;
    {
        jvirt_barray_ptr arr = (*cinfo.mem->request_virt_barray)(
            (j_common_ptr)&cinfo, JPOOL_IMAGE, FALSE,
            (JDIMENSION)wb, (JDIMENSION)hb, 1);
        static jvirt_barray_ptr arrs[1];
        arrs[0] = arr;
        coefs = arrs;
        /* realize virtual arrays */
        (*cinfo.mem->realize_virt_arrays)((j_common_ptr)&cinfo);
        for (by = 0; by < (JDIMENSION)hb; by++) {
            JBLOCKARRAY rows = (*cinfo.mem->access_virt_barray)(
                (j_common_ptr)&cinfo, arr, by, 1, TRUE);
            int bx;
            for (bx = 0; bx < wb; bx++)
                for (k = 0; k < DCTSIZE2; k++)
                    rows[0][bx][k] =
                        vals[((size_t)by * wb + bx) * DCTSIZE2 + k];
        }
    }
    jpeg_write_coefficients(&cinfo, coefs);
    jpeg_finish_compress(&cinfo);
    fwrite(buf, 1, buflen, stdout);
    jpeg_destroy_compress(&cinfo);
    (void)dinfo; (void)derr;
    return 0;
}

static int do_coefs(void)
{
    struct jpeg_decompress_struct cinfo;
    struct jpeg_error_mgr jerr;
    jvirt_barray_ptr *coefs;
    unsigned char *data = NULL;
    size_t len = 0, cap = 1 << 20;
    int ci;

    data = malloc(cap);
    for (;;) {
        size_t got = fread(data + len, 1, cap - len, stdin);
        len += got;
        if (got == 0) break;
        if (len == cap) { cap *= 2; data = realloc(data, cap); }
    }
    cinfo.err = jpeg_std_error(&jerr);
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, data, (unsigned long)len);
    jpeg_read_header(&cinfo, TRUE);
    coefs = jpeg_read_coefficients(&cinfo);
    for (ci = 0; ci < cinfo.num_components; ci++) {
        jpeg_component_info *comp = cinfo.comp_info + ci;
        JDIMENSION by;
        printf("component %d blocks %u x %u\n", ci,
               (unsigned)comp->width_in_blocks,
               (unsigned)comp->height_in_blocks);
        for (by = 0; by < comp->height_in_blocks; by++) {
            JBLOCKARRAY rows = (*cinfo.mem->access_virt_barray)(
                (j_common_ptr)&cinfo, coefs[ci], by, 1, FALSE);
            JDIMENSION bx;
            for (bx = 0; bx < comp->width_in_blocks; bx++) {
                int k;
                for (k = 0; k < DCTSIZE2; k++)
                    printf("%d ", rows[0][bx][k]);
                printf("\n");
            }
        }
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

int main(int argc, char **argv)
{
    if (argc >= 2 && strcmp(argv[1], "encode") == 0 && argc == 4)
        return do_encode(atoi(argv[2]), atoi(argv[3]));
    if (argc >= 2 && strcmp(argv[1], "encodec") == 0 && argc >= 4)
        return do_encode_coefs(atoi(argv[2]), atoi(argv[3]),
                               argc > 4 ? atoi(argv[4]) : 0, 0);
    if (argc >= 2 && strcmp(argv[1], "encodecp") == 0 && argc >= 4)
        return do_encode_coefs(atoi(argv[2]), atoi(argv[3]), 0, 1);
    if (argc >= 2 && strcmp(argv[1], "coefs") == 0)
        return do_coefs();
    fprintf(stderr, "usage: jpegref encode <w> <h> | jpegref coefs\n");
    return 1;
}
