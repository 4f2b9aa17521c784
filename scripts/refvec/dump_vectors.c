/* Reference-vector dumper: builds against the UNMODIFIED reference
 * rtlib sources (fhe-cmplr/rtlib/ant) and dumps test vectors as JSON
 * at the ut_ckks_arithmetic fixture parameters (degree 16, 8 primes,
 * 33/30-bit — rtlib/ant/unittest/ut_ckks_arithmetic.cxx:26-31).
 *
 * The dump contains every deterministic algorithm's (input, output)
 * pair plus the randomly-generated keys/ciphertexts needed to replay
 * them, so ace_tpu's tests can assert BIT-EXACT agreement against
 * vectors whose provenance is the reference binary (not a same-author
 * re-implementation):
 *   - per-prime negacyclic NTT fwd/inv          (util/ntt.c)
 *   - CKKS encode                               (util/ckks_encoder.c)
 *   - decrypt identity on a dumped ciphertext   (c0 + c1*s)
 *   - hybrid keyswitch digits (Switch_key_precompute = decompose+raise)
 *   - mul+relin, rescale, rotate with the dumped keys
 *
 * Build/run: scripts/refvec/gen_vectors.sh (gcc against the reference
 * tree + the gmp.h ABI shim in this directory; zero reference files
 * are modified or copied).
 */
#include <stdio.h>
#include <stdlib.h>

#include "util/ckks_parameters.h"
#include "util/ckks_encoder.h"
#include "util/ckks_encryptor.h"
#include "util/ckks_decryptor.h"
#include "util/ckks_evaluator.h"
#include "util/ckks_key_generator.h"
#include "util/ciphertext.h"
#include "util/plaintext.h"
#include "util/polynomial.h"
#include "util/public_key.h"
#include "util/secret_key.h"
#include "util/switch_key.h"
#include "util/crt.h"
#include "util/ntt.h"
#include "util/fhe_types.h"

static FILE* out;
static int   first_in_obj = 1;

static void key_start(const char* name) {
  if (!first_in_obj) fprintf(out, ",\n");
  first_in_obj = 0;
  fprintf(out, "\"%s\": ", name);
}

static void dump_poly(const char* name, POLYNOMIAL* p) {
  key_start(name);
  size_t nq = Get_num_q(p), np = Get_num_p(p);
  size_t n  = Get_rdgree(p);
  fprintf(out, "{\"num_q\": %zu, \"num_p\": %zu, \"degree\": %zu, "
               "\"is_ntt\": %d, \"data\": [", nq, np, n, Is_ntt(p) ? 1 : 0);
  size_t total = (nq + np) * n;
  for (size_t i = 0; i < total; i++)
    fprintf(out, "%s%lld", i ? "," : "", (long long)p->_data[i]);
  fprintf(out, "]}");
}

static void dump_swk(const char* name, SWITCH_KEY* k) {
  key_start(name);
  fprintf(out, "{\"parts\": [");
  for (size_t i = 0; i < Get_swk_size(k); i++) {
    PUBLIC_KEY* pk = Get_swk_at(k, i);
    fprintf(out, "%s{", i ? "," : "");
    int save = first_in_obj; first_in_obj = 1;
    dump_poly("b", Get_pk0(pk));
    dump_poly("a", Get_pk1(pk));
    fprintf(out, "}");
    first_in_obj = save;
  }
  fprintf(out, "]}");
}

static void dump_u64s(const char* name, uint64_t* v, size_t n) {
  key_start(name);
  fprintf(out, "[");
  for (size_t i = 0; i < n; i++)
    fprintf(out, "%s%llu", i ? "," : "", (unsigned long long)v[i]);
  fprintf(out, "]");
}

static void dump_i64_vl(const char* name, VALUE_LIST* vl) {
  key_start(name);
  fprintf(out, "[");
  for (size_t i = 0; i < LIST_LEN(vl); i++)
    fprintf(out, "%s%lld", i ? "," : "", (long long)I64_VALUE_AT(vl, i));
  fprintf(out, "]");
}

static void dump_ciph(const char* name, CIPHERTEXT* c) {
  key_start(name);
  fprintf(out, "{\"scaling_factor\": %.17g, \"sf_degree\": %u, "
               "\"slots\": %u,", Get_ciph_sfactor(c), Get_ciph_sf_degree(c),
          Get_ciph_slots(c));
  int save = first_in_obj; first_in_obj = 1;
  dump_poly("c0", Get_c0(c));
  dump_poly("c1", Get_c1(c));
  fprintf(out, "}");
  first_in_obj = save;
}

int main(int argc, char** argv) {
  const char* path = argc > 1 ? argv[1] : "ref_vectors.json";
  out = fopen(path, "w");
  fprintf(out, "{\n");

  uint32_t degree = 16;
  size_t   num_q = 8, q0_bits = 33, sf_bits = 30;

  CKKS_PARAMETER* param = Alloc_ckks_parameter();
  Init_ckks_parameters_with_prime_size(param, degree, HE_STD_NOT_SET, num_q,
                                       q0_bits, sf_bits, 0);
  CKKS_KEY_GENERATOR* keygen = Alloc_ckks_key_generator(param, NULL, 0);
  CKKS_ENCODER*       encoder = Alloc_ckks_encoder(param);
  CKKS_ENCRYPTOR* encryptor =
      Alloc_ckks_encryptor(param, Get_pk(keygen), Get_sk(keygen));
  CKKS_DECRYPTOR* decryptor = Alloc_ckks_decryptor(param, Get_sk(keygen));
  CKKS_EVALUATOR* eval =
      Alloc_ckks_evaluator(param, encoder, decryptor, keygen);
  CRT_CONTEXT* crt = Get_param_crt(param);

  key_start("fixture");
  fprintf(out, "{\"degree\": %u, \"num_q\": %zu, \"first_mod_size\": %zu, "
               "\"scaling_mod_size\": %zu, \"scaling_factor\": %.17g, "
               "\"num_q_parts\": %zu}",
          degree, num_q, q0_bits, sf_bits, Get_param_sc(param),
          Get_num_parts(Get_qpart(crt)));

  /* primes */
  VL_CRTPRIME* qprimes = Get_q_primes(crt);
  VL_CRTPRIME* pprimes = Get_p_primes(crt);
  size_t       num_p   = LIST_LEN(pprimes);
  {
    key_start("q_primes");
    fprintf(out, "[");
    for (size_t i = 0; i < LIST_LEN(qprimes); i++)
      fprintf(out, "%s%lld", i ? "," : "",
              (long long)Get_modulus_val(Get_vlprime_at(qprimes, i)));
    fprintf(out, "]");
    key_start("p_primes");
    fprintf(out, "[");
    for (size_t i = 0; i < num_p; i++)
      fprintf(out, "%s%lld", i ? "," : "",
              (long long)Get_modulus_val(Get_vlprime_at(pprimes, i)));
    fprintf(out, "]");
  }

  /* per-prime NTT fwd/inv on a fixed deterministic input */
  {
    key_start("ntt");
    fprintf(out, "[");
    for (size_t l = 0; l < LIST_LEN(qprimes); l++) {
      CRT_PRIME*  prime = Get_vlprime_at(qprimes, l);
      NTT_CONTEXT* ntt  = Get_ntt(prime);
      uint64_t     q    = (uint64_t)Get_modulus_val(prime);
      VALUE_LIST* x   = Alloc_value_list(I64_TYPE, degree);
      VALUE_LIST* fwd = Alloc_value_list(I64_TYPE, degree);
      VALUE_LIST* inv = Alloc_value_list(I64_TYPE, degree);
      for (uint32_t i = 0; i < degree; i++)
        I64_VALUE_AT(x, i) =
            (int64_t)(((unsigned __int128)(i + 1) * 2654435761u + l * 97) % q);
      Ftt_fwd(fwd, ntt, x);
      Ftt_inv(inv, ntt, fwd);
      fprintf(out, "%s{", l ? "," : "");
      int save = first_in_obj; first_in_obj = 1;
      key_start("q"); fprintf(out, "%llu", (unsigned long long)q);
      dump_i64_vl("input", x);
      dump_i64_vl("fwd", fwd);
      dump_i64_vl("inv_roundtrip", inv);
      fprintf(out, "}");
      first_in_obj = save;
      Free_value_list(x); Free_value_list(fwd); Free_value_list(inv);
    }
    fprintf(out, "]");
  }

  /* encode at full level */
  size_t slots = degree / 2;
  VALUE_LIST* msg = Alloc_value_list(DCMPLX_TYPE, slots);
  for (size_t i = 0; i < slots; i++)
    DCMPLX_VALUE_AT(msg, i) = 0.1 * (double)(i + 1) - 0.35;
  {
    key_start("encode_msg_re");
    fprintf(out, "[");
    for (size_t i = 0; i < slots; i++)
      fprintf(out, "%s%.17g", i ? "," : "", creal(DCMPLX_VALUE_AT(msg, i)));
    fprintf(out, "]");
  }
  PLAINTEXT* plain = Alloc_plaintext();
  ENCODE_AT_LEVEL(plain, encoder, msg, num_q);
  dump_poly("encode_poly", Get_plain_poly(plain));

  /* keys */
  dump_poly("sk", Get_sk_poly(Get_sk(keygen)));
  dump_poly("sk_ntt", Get_ntt_sk(Get_sk(keygen)));
  dump_swk("relin_key", Get_relin_key(keygen));

  /* encrypt + decrypt identity */
  CIPHERTEXT* ciph = Alloc_ciphertext();
  Encrypt_msg(ciph, encryptor, plain);
  dump_ciph("fresh_ciph", ciph);
  PLAINTEXT* dec = Alloc_plaintext();
  Decrypt(dec, decryptor, ciph, NULL);
  dump_poly("decrypt_poly", Get_plain_poly(dec));

  /* keyswitch digits: decompose+raise of c1 */
  {
    VALUE_LIST* precomp = Switch_key_precompute(Get_c1(ciph), crt);
    key_start("ksw_digits");
    fprintf(out, "[");
    for (size_t i = 0; i < LIST_LEN(precomp); i++) {
      POLYNOMIAL* d = (POLYNOMIAL*)PTR_VALUE_AT(precomp, i);
      fprintf(out, "%s{", i ? "," : "");
      int save = first_in_obj; first_in_obj = 1;
      dump_poly("raised", d);
      fprintf(out, "}");
      first_in_obj = save;
    }
    fprintf(out, "]");
  }

  /* mul + relin, then rescale */
  CIPHERTEXT* prod = Alloc_ciphertext();
  Mul_ciphertext(prod, ciph, ciph, Get_relin_key(keygen), eval);
  dump_ciph("mul_relin", prod);
  CIPHERTEXT* rs = Alloc_ciphertext();
  Rescale_ciphertext(rs, prod, eval);
  dump_ciph("rescale", rs);

  /* rotate by 3 */
  {
    int32_t rot = 3;
    Insert_rot_map(keygen, rot);
    uint32_t    auto_idx = Get_precomp_auto_idx(keygen, rot);
    SWITCH_KEY* rot_key  = Get_auto_key(keygen, auto_idx);
    key_start("rot_idx"); fprintf(out, "%d", rot);
    key_start("auto_idx"); fprintf(out, "%u", auto_idx);
    dump_swk("rot_key", rot_key);
    CIPHERTEXT* rotc = Alloc_ciphertext();
    Eval_fast_rotate(rotc, ciph, rot, rot_key, eval);
    dump_ciph("rotate", rotc);
  }

  /* decode of decrypt for an end-to-end float check */
  {
    VALUE_LIST* decoded = Alloc_value_list(DCMPLX_TYPE, slots);
    Decode(decoded, encoder, dec);
    key_start("decode_re");
    fprintf(out, "[");
    for (size_t i = 0; i < slots; i++)
      fprintf(out, "%s%.17g", i ? "," : "",
              creal(DCMPLX_VALUE_AT(decoded, i)));
    fprintf(out, "]");
  }

  fprintf(out, "\n}\n");
  fclose(out);
  fprintf(stderr, "wrote %s\n", path);
  return 0;
}
