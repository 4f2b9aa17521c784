/* Minimal GMP shim for building the reference rtlib in an environment
 * with libgmp.so.10 but no gmp-dev headers. Declares only the API
 * surface fhe_bignumber.h / rtlib sources use, with GMP's documented
 * stable ABI struct layouts; function macros map to the versioned
 * __gmp* symbols exported by libgmp.so.10. */
#ifndef ACE_GMP_SHIM_H
#define ACE_GMP_SHIM_H
#include <stdio.h>
#include <stdarg.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef unsigned long mp_limb_t;
typedef long mp_exp_t;
typedef unsigned long mp_bitcnt_t;

typedef struct { int _mp_alloc; int _mp_size; mp_limb_t *_mp_d; } __mpz_struct;
typedef __mpz_struct mpz_t[1];
typedef __mpz_struct *mpz_ptr;
typedef const __mpz_struct *mpz_srcptr;

typedef struct { int _mp_prec; int _mp_size; mp_exp_t _mp_exp;
                 mp_limb_t *_mp_d; } __mpf_struct;
typedef __mpf_struct mpf_t[1];
typedef __mpf_struct *mpf_ptr;
typedef const __mpf_struct *mpf_srcptr;

typedef struct {
  mpz_t _mp_seed;
  int _mp_alg;
  union { void *_mp_lc; } _mp_algdata;
} __gmp_randstate_struct;
typedef __gmp_randstate_struct gmp_randstate_t[1];

#define mpz_init __gmpz_init
#define mpz_inits __gmpz_inits
#define mpz_clear __gmpz_clear
#define mpz_clears __gmpz_clears
#define mpz_set __gmpz_set
#define mpz_set_si __gmpz_set_si
#define mpz_set_ui __gmpz_set_ui
#define mpz_set_d __gmpz_set_d
#define mpz_set_str __gmpz_set_str
#define mpz_init_set __gmpz_init_set
#define mpz_init_set_si __gmpz_init_set_si
#define mpz_init_set_ui __gmpz_init_set_ui
#define mpz_init_set_d __gmpz_init_set_d
#define mpz_add __gmpz_add
#define mpz_add_ui __gmpz_add_ui
#define mpz_sub __gmpz_sub
#define mpz_sub_ui __gmpz_sub_ui
#define mpz_mul __gmpz_mul
#define mpz_mul_ui __gmpz_mul_ui
#define mpz_mul_si __gmpz_mul_si
#define mpz_mul_2exp __gmpz_mul_2exp
#define mpz_addmul __gmpz_addmul
#define mpz_addmul_ui __gmpz_addmul_ui
#define mpz_fdiv_q __gmpz_fdiv_q
#define mpz_fdiv_q_ui __gmpz_fdiv_q_ui
#define mpz_fdiv_q_2exp __gmpz_fdiv_q_2exp
#define mpz_fdiv_r __gmpz_fdiv_r
#define mpz_fdiv_r_ui __gmpz_fdiv_r_ui
#define mpz_powm __gmpz_powm
#define mpz_pow_ui __gmpz_pow_ui
#define mpz_sqrt __gmpz_sqrt
#define mpz_invert __gmpz_invert
#define mpz_cmp __gmpz_cmp
#define mpz_cmp_si __gmpz_cmp_si
#define mpz_fits_slong_p __gmpz_fits_slong_p
#define mpz_get_si __gmpz_get_si
#define mpz_get_ui __gmpz_get_ui
#define mpz_get_d __gmpz_get_d
#define mpz_get_d_2exp __gmpz_get_d_2exp
#define mpz_sizeinbase __gmpz_sizeinbase
#define mpz_urandomm __gmpz_urandomm

#define mpf_init __gmpf_init
#define mpf_inits __gmpf_inits
#define mpf_clears __gmpf_clears
#define mpf_init_set __gmpf_init_set
#define mpf_init_set_d __gmpf_init_set_d
#define mpf_init_set_si __gmpf_init_set_si
#define mpf_set __gmpf_set
#define mpf_set_d __gmpf_set_d
#define mpf_set_si __gmpf_set_si
#define mpf_set_z __gmpf_set_z
#define mpf_mul __gmpf_mul
#define mpf_mul_ui __gmpf_mul_ui
#define mpf_div __gmpf_div
#define mpf_get_d __gmpf_get_d
#define mpf_get_str __gmpf_get_str

#define gmp_printf __gmp_printf
#define gmp_fprintf __gmp_fprintf

void __gmpz_init(mpz_ptr);
void __gmpz_inits(mpz_ptr, ...);
void __gmpz_clear(mpz_ptr);
void __gmpz_clears(mpz_ptr, ...);
void __gmpz_set(mpz_ptr, mpz_srcptr);
void __gmpz_set_si(mpz_ptr, long);
void __gmpz_set_ui(mpz_ptr, unsigned long);
void __gmpz_set_d(mpz_ptr, double);
int __gmpz_set_str(mpz_ptr, const char *, int);
void __gmpz_init_set(mpz_ptr, mpz_srcptr);
void __gmpz_init_set_si(mpz_ptr, long);
void __gmpz_init_set_ui(mpz_ptr, unsigned long);
void __gmpz_init_set_d(mpz_ptr, double);
void __gmpz_add(mpz_ptr, mpz_srcptr, mpz_srcptr);
void __gmpz_add_ui(mpz_ptr, mpz_srcptr, unsigned long);
void __gmpz_sub(mpz_ptr, mpz_srcptr, mpz_srcptr);
void __gmpz_sub_ui(mpz_ptr, mpz_srcptr, unsigned long);
void __gmpz_mul(mpz_ptr, mpz_srcptr, mpz_srcptr);
void __gmpz_mul_ui(mpz_ptr, mpz_srcptr, unsigned long);
void __gmpz_mul_si(mpz_ptr, mpz_srcptr, long);
void __gmpz_mul_2exp(mpz_ptr, mpz_srcptr, mp_bitcnt_t);
void __gmpz_addmul(mpz_ptr, mpz_srcptr, mpz_srcptr);
void __gmpz_addmul_ui(mpz_ptr, mpz_srcptr, unsigned long);
void __gmpz_fdiv_q(mpz_ptr, mpz_srcptr, mpz_srcptr);
unsigned long __gmpz_fdiv_q_ui(mpz_ptr, mpz_srcptr, unsigned long);
void __gmpz_fdiv_q_2exp(mpz_ptr, mpz_srcptr, mp_bitcnt_t);
void __gmpz_fdiv_r(mpz_ptr, mpz_srcptr, mpz_srcptr);
unsigned long __gmpz_fdiv_r_ui(mpz_ptr, mpz_srcptr, unsigned long);
void __gmpz_powm(mpz_ptr, mpz_srcptr, mpz_srcptr, mpz_srcptr);
void __gmpz_pow_ui(mpz_ptr, mpz_srcptr, unsigned long);
void __gmpz_sqrt(mpz_ptr, mpz_srcptr);
int __gmpz_invert(mpz_ptr, mpz_srcptr, mpz_srcptr);
int __gmpz_cmp(mpz_srcptr, mpz_srcptr);
int __gmpz_cmp_si(mpz_srcptr, long);
int __gmpz_fits_slong_p(mpz_srcptr);
long __gmpz_get_si(mpz_srcptr);
unsigned long __gmpz_get_ui(mpz_srcptr);
double __gmpz_get_d(mpz_srcptr);
double __gmpz_get_d_2exp(long *, mpz_srcptr);
size_t __gmpz_sizeinbase(mpz_srcptr, int);
void __gmpz_urandomm(mpz_ptr, gmp_randstate_t, mpz_srcptr);

void __gmpf_init(mpf_ptr);
void __gmpf_inits(mpf_ptr, ...);
void __gmpf_clears(mpf_ptr, ...);
void __gmpf_init_set(mpf_ptr, mpf_srcptr);
void __gmpf_init_set_d(mpf_ptr, double);
void __gmpf_init_set_si(mpf_ptr, long);
void __gmpf_set(mpf_ptr, mpf_srcptr);
void __gmpf_set_d(mpf_ptr, double);
void __gmpf_set_si(mpf_ptr, long);
void __gmpf_set_z(mpf_ptr, mpz_srcptr);
void __gmpf_mul(mpf_ptr, mpf_srcptr, mpf_srcptr);
void __gmpf_mul_ui(mpf_ptr, mpf_srcptr, unsigned long);
void __gmpf_div(mpf_ptr, mpf_srcptr, mpf_srcptr);
double __gmpf_get_d(mpf_srcptr);
char *__gmpf_get_str(char *, mp_exp_t *, int, size_t, mpf_srcptr);

int __gmp_printf(const char *, ...);
int __gmp_fprintf(FILE *, const char *, ...);

#ifdef __cplusplus
}
#endif
#endif
