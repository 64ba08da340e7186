/* Test-only harness: drive the SYSTEM libjpeg (libjpeg-turbo) as the
 * canonical ITU-T T.81 implementation to cross-pin the repo's
 * from-scratch arithmetic-JPEG codec (evm_archive_spark/operators/
 * jpegarith.py), the same both-directions pin the VP8L codec has
 * against libwebp.  Compiled at test time (gcc + jpeglib.h gated;
 * tests skip if unavailable).  Modes:
 *
 *   enc W H NCOMP [p]   raw pixels (stdin) -> arithmetic JPEG (stdout);
 *                       'p' adds progressive scan scripting
 *   dec                 JPEG (stdin) -> "W H NCOMP\n" + raw pixels
 *   t2a [p]             JPEG (stdin) -> ARITHMETIC JPEG with the SAME
 *                       quantized coefficients (jpeg_read_coefficients
 *                       -> jpeg_copy_critical_parameters), so entropy-
 *                       layer checks are coefficient-exact, no IDCT
 *                       tolerance needed
 *   t2h                 JPEG (stdin) -> HUFFMAN JPEG, same coefficients
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static unsigned char *read_all(FILE *f, unsigned long *n) {
  unsigned long cap = 1 << 20, len = 0;
  unsigned char *buf = malloc(cap);
  size_t got;
  while ((got = fread(buf + len, 1, cap - len, f)) > 0) {
    len += got;
    if (len == cap) { cap *= 2; buf = realloc(buf, cap); }
  }
  *n = len;
  return buf;
}

static void die(const char *msg) { fprintf(stderr, "%s\n", msg); exit(2); }

static int mode_enc(int w, int h, int ncomp, int progressive,
                    int restart) {
  unsigned long n;
  unsigned char *pix = read_all(stdin, &n);
  if ((int)n != w * h * ncomp) die("pixel payload size mismatch");

  struct jpeg_compress_struct c;
  struct jpeg_error_mgr err;
  unsigned char *out = NULL; unsigned long outn = 0;
  c.err = jpeg_std_error(&err);
  jpeg_create_compress(&c);
  jpeg_mem_dest(&c, &out, &outn);
  c.image_width = w; c.image_height = h;
  c.input_components = ncomp;
  c.in_color_space = ncomp == 1 ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_set_defaults(&c);
  c.arith_code = TRUE;
  jpeg_set_quality(&c, 90, TRUE);
  if (progressive) jpeg_simple_progression(&c);
  if (restart > 0) c.restart_interval = restart;
  jpeg_start_compress(&c, TRUE);
  while (c.next_scanline < c.image_height) {
    JSAMPROW row = pix + (size_t)c.next_scanline * w * ncomp;
    jpeg_write_scanlines(&c, &row, 1);
  }
  jpeg_finish_compress(&c);
  jpeg_destroy_compress(&c);
  fwrite(out, 1, outn, stdout);
  return 0;
}

static int mode_dec(void) {
  unsigned long n;
  unsigned char *jpg = read_all(stdin, &n);
  struct jpeg_decompress_struct d;
  struct jpeg_error_mgr err;
  d.err = jpeg_std_error(&err);
  jpeg_create_decompress(&d);
  jpeg_mem_src(&d, jpg, n);
  if (jpeg_read_header(&d, TRUE) != JPEG_HEADER_OK) die("bad header");
  jpeg_start_decompress(&d);
  printf("%d %d %d\n", d.output_width, d.output_height,
         d.output_components);
  fflush(stdout);
  unsigned char *row = malloc((size_t)d.output_width * d.output_components);
  while (d.output_scanline < d.output_height) {
    JSAMPROW r = row;
    jpeg_read_scanlines(&d, &r, 1);
    fwrite(row, 1, (size_t)d.output_width * d.output_components, stdout);
  }
  jpeg_finish_decompress(&d);
  jpeg_destroy_decompress(&d);
  return 0;
}

/* Coefficient-preserving transcode: huffman <-> arithmetic. */
static int mode_transcode(int to_arith, int progressive) {
  unsigned long n;
  unsigned char *jpg = read_all(stdin, &n);
  struct jpeg_decompress_struct d;
  struct jpeg_compress_struct c;
  struct jpeg_error_mgr derr, cerr;
  unsigned char *out = NULL; unsigned long outn = 0;

  d.err = jpeg_std_error(&derr);
  jpeg_create_decompress(&d);
  jpeg_mem_src(&d, jpg, n);
  if (jpeg_read_header(&d, TRUE) != JPEG_HEADER_OK) die("bad header");
  jvirt_barray_ptr *coefs = jpeg_read_coefficients(&d);
  if (!coefs) die("no coefficients");

  c.err = jpeg_std_error(&cerr);
  jpeg_create_compress(&c);
  jpeg_mem_dest(&c, &out, &outn);
  jpeg_copy_critical_parameters(&d, &c);
  c.arith_code = to_arith ? TRUE : FALSE;
  c.optimize_coding = FALSE;
  if (progressive) jpeg_simple_progression(&c);
  jpeg_write_coefficients(&c, coefs);
  jpeg_finish_compress(&c);
  jpeg_destroy_compress(&c);
  jpeg_finish_decompress(&d);
  jpeg_destroy_decompress(&d);
  fwrite(out, 1, outn, stdout);
  return 0;
}

int main(int argc, char **argv) {
  if (argc < 2) die("usage: enc|dec|t2a|t2h ...");
  if (!strcmp(argv[1], "enc")) {
    if (argc < 5) die("enc W H NCOMP [p] [rN]");
    int prog = 0, restart = 0, i;
    for (i = 5; i < argc; i++) {
      if (argv[i][0] == 'p') prog = 1;
      else if (argv[i][0] == 'r') restart = atoi(argv[i] + 1);
    }
    return mode_enc(atoi(argv[2]), atoi(argv[3]), atoi(argv[4]),
                    prog, restart);
  }
  if (!strcmp(argv[1], "dec")) return mode_dec();
  if (!strcmp(argv[1], "t2a"))
    return mode_transcode(1, argc > 2 && argv[2][0] == 'p');
  if (!strcmp(argv[1], "t2h")) return mode_transcode(0, 0);
  die("unknown mode");
  return 2;
}
