/* Reference-vector dumper #2: bootstrap stages.
 *
 * Builds against the UNMODIFIED reference rtlib (fhe-cmplr/rtlib/ant)
 * and dumps per-stage ciphertexts of Eval_bootstrap
 * (ckks_bootstrap_context.c:1584-1862) at a degree-64 fixture
 * (ut_ckks_bootstrap.cxx:26-29 parameters, hamming weight 32 so the
 * hw<=192 sine table — the ResNet path's table — is selected):
 *
 *   fully packed (slots = N/2): input -> raised -> coeffs_to_slots ->
 *     conj/rescale split -> approx-mod (real) -> recombine ->
 *     slots_to_coeffs -> full Eval_bootstrap result
 *   sparse (slots = 8): input -> full Eval_bootstrap result
 *
 * plus every key the replay needs (sk, relin, conj, all bootstrap
 * rotation keys). ace_tpu's tests/test_ref_bootstrap.py replays each
 * stage and asserts bit-exact agreement. Zero reference files are
 * modified or copied; the stage sequence here intentionally mirrors
 * the fully-packed branch of Eval_bootstrap so its intermediates are
 * the ones the real pipeline produces (verified: the dumped full
 * result equals the staged chain's final ct).
 */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>

#include "util/ckks_parameters.h"
#include "util/ckks_encoder.h"
#include "util/ckks_encryptor.h"
#include "util/ckks_decryptor.h"
#include "util/ckks_evaluator.h"
#include "util/ckks_key_generator.h"
#include "util/ckks_bootstrap_context.h"
#include "util/ciphertext.h"
#include "util/plaintext.h"
#include "util/polynomial.h"
#include "util/public_key.h"
#include "util/secret_key.h"
#include "util/switch_key.h"
#include "util/crt.h"
#include "util/fhe_types.h"
#include "common/rt_config.h"

/* non-static internals of ckks_bootstrap_context.c used for staging */
extern void Eval_approx_mod(CKKS_BTS_CTX* bts_ctx, CIPHERTEXT* out,
                            CIPHERTEXT* in, VL_DBL* coeffs, double lb,
                            double ub);
extern LL*  Find_rot_indices(CKKS_BTS_PRECOM* precom, uint32_t slots,
                             uint32_t m);
extern void Transform_values_from_level0(POLYNOMIAL* res, POLYNOMIAL* poly,
                                         CRT_CONTEXT* crt);

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
  const char* path = argc > 1 ? argv[1] : "ref_bootstrap.json";
  out = fopen(path, "w");
  fprintf(out, "{\n");

  uint32_t degree = 64;
  size_t   num_q = 33, q0_bits = 60, sf_bits = 51, hamming = 32;

  CKKS_PARAMETER* param = Alloc_ckks_parameter();
  Init_ckks_parameters_with_prime_size(param, degree, HE_STD_NOT_SET, num_q,
                                       q0_bits, sf_bits, hamming);
  CKKS_KEY_GENERATOR* keygen = Alloc_ckks_key_generator(param, NULL, 0);
  CKKS_ENCODER*       encoder = Alloc_ckks_encoder(param);
  CKKS_ENCRYPTOR* encryptor =
      Alloc_ckks_encryptor(param, Get_pk(keygen), Get_sk(keygen));
  CKKS_DECRYPTOR* decryptor = Alloc_ckks_decryptor(param, Get_sk(keygen));
  CKKS_EVALUATOR* eval =
      Alloc_ckks_evaluator(param, encoder, decryptor, keygen);
  CKKS_BTS_CTX* bts_ctx = Get_bts_ctx(eval);
  CRT_CONTEXT*  crt     = Get_param_crt(param);
  /* the model path clears the imaginary part (context.c default) */
  Set_rtlib_config(CONF_BTS_CLEAR_IMAG, 1);

  key_start("fixture");
  fprintf(out, "{\"degree\": %u, \"num_q\": %zu, \"first_mod_size\": %zu, "
               "\"scaling_mod_size\": %zu, \"scaling_factor\": %.17g, "
               "\"hamming_weight\": %zu, \"num_q_parts\": %zu, "
               "\"level_budget\": [3, 3]}",
          degree, num_q, q0_bits, sf_bits, Get_param_sc(param), hamming,
          Get_num_parts(Get_qpart(crt)));

  VL_CRTPRIME* qprimes = Get_q_primes(crt);
  VL_CRTPRIME* pprimes = Get_p_primes(crt);
  {
    key_start("q_primes");
    fprintf(out, "[");
    for (size_t i = 0; i < LIST_LEN(qprimes); i++)
      fprintf(out, "%s%lld", i ? "," : "",
              (long long)Get_modulus_val(Get_vlprime_at(qprimes, i)));
    fprintf(out, "]");
    key_start("p_primes");
    fprintf(out, "[");
    for (size_t i = 0; i < LIST_LEN(pprimes); i++)
      fprintf(out, "%s%lld", i ? "," : "",
              (long long)Get_modulus_val(Get_vlprime_at(pprimes, i)));
    fprintf(out, "]");
  }

  /* bootstrap setup + keygen: fully packed */
  uint32_t m         = degree * 2;
  uint32_t num_slots = degree / 2;
  VL_UI32* level_budget = Alloc_value_list(UI32_TYPE, 2);
  VL_UI32* dim1         = Alloc_value_list(UI32_TYPE, 2);
  UI32_VALUE_AT(level_budget, 0) = 3;
  UI32_VALUE_AT(level_budget, 1) = 3;
  UI32_VALUE_AT(dim1, 0)         = 0;
  UI32_VALUE_AT(dim1, 1)         = 0;
  Bootstrap_setup(bts_ctx, level_budget, dim1, num_slots);
  Bootstrap_keygen(bts_ctx, num_slots);
  CKKS_BTS_PRECOM* precom = Get_bts_precom(bts_ctx, num_slots);

  /* keys */
  dump_poly("sk", Get_sk_poly(Get_sk(keygen)));
  dump_poly("sk_ntt", Get_ntt_sk(Get_sk(keygen)));
  dump_swk("relin_key", Get_relin_key(keygen));
  dump_swk("conj_key", Get_auto_key(keygen, m - 1));
  {
    LL*    rot_idxs = Find_rot_indices(precom, num_slots, m);
    key_start("rot_keys");
    fprintf(out, "[");
    int first = 1;
    FOR_ALL_LL_ELEM(rot_idxs, node) {
      int32_t  rot      = node->_val;
      uint32_t auto_idx = Get_precomp_auto_idx(keygen, rot);
      fprintf(out, "%s{\"rot\": %d, \"auto_idx\": %u,", first ? "" : ",",
              rot, auto_idx);
      first = 0;
      int save = first_in_obj; first_in_obj = 1;
      dump_swk("key", Get_auto_key(keygen, auto_idx));
      fprintf(out, "}");
      first_in_obj = save;
    }
    fprintf(out, "]");
    Free_link_list(rot_idxs);
  }

  /* keys for EVERY rotation 1..m/4-1: lets the replay resolve any
   * offset-reduction convention without caring which exact subset the
   * reference's Find_rot_indices picked */
  {
    key_start("all_rot_keys");
    fprintf(out, "[");
    for (uint32_t rot = 1; rot < m / 4; rot++) {
      Insert_rot_map(keygen, (int32_t)rot);
      uint32_t auto_idx = Get_precomp_auto_idx(keygen, (int32_t)rot);
      fprintf(out, "%s{\"rot\": %u, \"auto_idx\": %u,", rot == 1 ? "" : ",",
              rot, auto_idx);
      int save = first_in_obj; first_in_obj = 1;
      dump_swk("key", Get_auto_key(keygen, auto_idx));
      fprintf(out, "}");
      first_in_obj = save;
    }
    fprintf(out, "]");
  }

  /* precomputed C2S/S2C diagonal plaintexts (for plaintext-level
   * comparison in the replay tests) */
  {
    VL_VL_PLAIN* pre[2] = {Get_u0hatt_pre_fft(precom),
                           Get_u0_pre_fft(precom)};
    const char*  nm[2]  = {"c2s_plains", "s2c_plains"};
    for (int t = 0; t < 2; t++) {
      key_start(nm[t]);
      fprintf(out, "[");
      for (size_t s = 0; s < LIST_LEN(pre[t]); s++) {
        VALUE_LIST* lvl = Get_vl_value_at(pre[t], s);
        fprintf(out, "%s[", s ? "," : "");
        for (size_t d = 0; d < LIST_LEN(lvl); d++) {
          PLAINTEXT* pl = (PLAINTEXT*)Get_ptr_value_at(lvl, d);
          fprintf(out, "%s", d ? "," : "");
          if (!pl) { fprintf(out, "null"); continue; }
          fprintf(out, "{\"scaling_factor\": %.17g, \"sf_degree\": %u,",
                  Get_plain_scaling_factor(pl), Get_plain_sf_degree(pl));
          int save = first_in_obj; first_in_obj = 1;
          dump_poly("poly", Get_plain_poly(pl));
          fprintf(out, "}");
          first_in_obj = save;
        }
        fprintf(out, "]");
      }
      fprintf(out, "]");
    }
  }

  /* input: known message encrypted at level 2, sf_degree 1 */
  size_t      slots = num_slots;
  VALUE_LIST* msg   = Alloc_value_list(DCMPLX_TYPE, slots);
  for (size_t i = 0; i < slots; i++)
    DCMPLX_VALUE_AT(msg, i) = 0.05 * (double)(i + 1) - 0.61;
  PLAINTEXT* plain = Alloc_plaintext();
  ENCODE_AT_LEVEL(plain, encoder, msg, 2);
  CIPHERTEXT* ciph = Alloc_ciphertext();
  Encrypt_msg(ciph, encryptor, plain);
  dump_ciph("bts_input", ciph);

  /* ---- staged fully-packed pipeline (Eval_bootstrap:1617-1745) ---- */
  MODULUS* mod_head     = Get_modulus_head(Get_q_primes(crt));
  int64_t  mod_head_val = Get_mod_val(mod_head);
  double   sf           = Get_param_sc(param);
  int32_t  deg          = (int32_t)round(log2((double)mod_head_val / sf));
  key_start("q0_sf_deg");
  fprintf(out, "%d", deg);

  /* raise */
  CIPHERTEXT* raised = Alloc_ciphertext();
  Init_ciphertext_from_ciph(raised, ciph, Get_ciph_sfactor(ciph),
                            Get_ciph_sf_degree(ciph));
  Copy_ciphertext(raised, ciph);
  if (Is_ntt(Get_c0(raised))) Conv_ntt2poly_inplace(Get_c0(raised), crt);
  if (Is_ntt(Get_c1(raised))) Conv_ntt2poly_inplace(Get_c1(raised), crt);
  CIPHERTEXT* new_ciph = Alloc_ciphertext();
  size_t      q_cnt    = Get_primes_cnt(Get_q(crt));
  Init_ciphertext(new_ciph, degree, q_cnt, 0, Get_ciph_sfactor(raised),
                  Get_ciph_sf_degree(raised), slots);
  Transform_values_from_level0(Get_c0(new_ciph), Get_c0(raised), crt);
  Transform_values_from_level0(Get_c1(new_ciph), Get_c1(raised), crt);
  Conv_poly2ntt_inplace(Get_c0(new_ciph), crt);
  Conv_poly2ntt_inplace(Get_c1(new_ciph), crt);
  dump_ciph("bts_raised", new_ciph);

  /* coeffs_to_slots */
  VL_VL_PLAIN* conj_hat_pre_fft = Get_u0hatt_pre_fft(precom);
  VL_VL_PLAIN* conj_pre_fft     = Get_u0_pre_fft(precom);
  CIPHERTEXT*  enc_ciph         = Alloc_ciphertext();
  Coeffs_to_slots(enc_ciph, new_ciph, conj_hat_pre_fft, bts_ctx);
  dump_ciph("bts_c2s", enc_ciph);

  /* conj split + rescale-to-1 */
  SWITCH_KEY* conj_key     = Get_auto_key(keygen, m - 1);
  CIPHERTEXT* conj_ciph    = Alloc_ciphertext();
  CIPHERTEXT* enc_ciph_sub = Alloc_ciphertext();
  Conjugate(conj_ciph, enc_ciph, conj_key, eval);
  Sub_ciphertext(enc_ciph_sub, enc_ciph, conj_ciph, eval);
  Add_ciphertext(enc_ciph, enc_ciph, conj_ciph, eval);
  Mul_by_monomial(enc_ciph_sub, enc_ciph_sub, 3 * m / 4, eval);
  while (Get_ciph_sf_degree(enc_ciph) > 1) {
    Rescale_ciphertext(enc_ciph, enc_ciph, eval);
    Rescale_ciphertext(enc_ciph_sub, enc_ciph_sub, eval);
  }
  dump_ciph("bts_pre_mod_real", enc_ciph);
  dump_ciph("bts_pre_mod_imag", enc_ciph_sub);

  /* approx-mod on both channels */
  const EVAL_SIN_POLY_INFO* sin_info = Get_eval_sin_poly_info(hamming);
  VL_DBL* coefficient = Alloc_value_list(DBL_TYPE, sin_info->_coeff_size);
  Init_dbl_value_list(coefficient, LIST_LEN(coefficient),
                      (double*)sin_info->_coeff);
  Eval_approx_mod(bts_ctx, enc_ciph, enc_ciph, coefficient, -1, 1);
  Eval_approx_mod(bts_ctx, enc_ciph_sub, enc_ciph_sub, coefficient, -1, 1);
  dump_ciph("bts_approx_real", enc_ciph);

  /* recombine */
  Mul_by_monomial(enc_ciph_sub, enc_ciph_sub, m / 4, eval);
  Add_ciphertext(enc_ciph, enc_ciph, enc_ciph_sub, eval);
  dump_ciph("bts_combined", enc_ciph);

  /* slots_to_coeffs */
  CIPHERTEXT* s2c = Alloc_ciphertext();
  Slots_to_coeffs(s2c, enc_ciph, conj_pre_fft, bts_ctx);
  dump_ciph("bts_s2c", s2c);

  /* full Eval_bootstrap end-to-end on the same input */
  CIPHERTEXT* full = Alloc_ciphertext();
  Eval_bootstrap(full, ciph, 1, 0, 0, bts_ctx);
  dump_ciph("bts_full", full);

  /* ---- sparse fixture: slots = 8, end-to-end ---- */
  {
    uint32_t sp_slots = 8;
    Bootstrap_setup(bts_ctx, level_budget, dim1, sp_slots);
    Bootstrap_keygen(bts_ctx, sp_slots);
    CKKS_BTS_PRECOM* sp_precom = Get_bts_precom(bts_ctx, sp_slots);
    LL* rot_idxs = Find_rot_indices(sp_precom, sp_slots, m);
    key_start("sparse_rot_keys");
    fprintf(out, "[");
    int first = 1;
    FOR_ALL_LL_ELEM(rot_idxs, node) {
      int32_t  rot      = node->_val;
      uint32_t auto_idx = Get_precomp_auto_idx(keygen, rot);
      fprintf(out, "%s{\"rot\": %d, \"auto_idx\": %u,", first ? "" : ",",
              rot, auto_idx);
      first = 0;
      int save = first_in_obj; first_in_obj = 1;
      dump_swk("key", Get_auto_key(keygen, auto_idx));
      fprintf(out, "}");
      first_in_obj = save;
    }
    fprintf(out, "]");
    Free_link_list(rot_idxs);
    /* the sparse partial-sum also rotates by j*slots (j = 1,2,...)
       and the tail by `slots`; those are in Find_rot_indices already */
    VALUE_LIST* sp_msg = Alloc_value_list(DCMPLX_TYPE, sp_slots);
    for (size_t i = 0; i < sp_slots; i++)
      DCMPLX_VALUE_AT(sp_msg, i) = 0.11 * (double)(i + 1) - 0.47;
    PLAINTEXT* sp_plain = Alloc_plaintext();
    ENCODE_AT_LEVEL(sp_plain, encoder, sp_msg, 2, sp_slots);
    CIPHERTEXT* sp_ciph = Alloc_ciphertext();
    Encrypt_msg(sp_ciph, encryptor, sp_plain);
    dump_ciph("bts_sparse_input", sp_ciph);
    CIPHERTEXT* sp_full = Alloc_ciphertext();
    Eval_bootstrap(sp_full, sp_ciph, 1, 0, 0, bts_ctx);
    dump_ciph("bts_sparse_full", sp_full);
  }

  fprintf(out, "\n}\n");
  fclose(out);
  fprintf(stderr, "wrote %s\n", path);
  return 0;
}
