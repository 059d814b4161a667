// Minimal GSL API shim so the reference (scienstanford/pbrt-v4) builds in a
// sandbox without libgsl. Implements exactly the subset the fork's cameras
// use (cameras.cpp: Brent root bracketing for biconic surfaces, a PRNG, and
// bivariate gaussian draws for HURB diffraction). Original implementation —
// not GSL source.
#ifndef PBRT_GSL_SHIM_H
#define PBRT_GSL_SHIM_H

#include <cmath>
#include <cstdlib>
#include <cstdint>

#define GSL_SUCCESS 0
#define GSL_CONTINUE -2
#define GSL_EINVAL 4

inline void gsl_set_error_handler_off() {}

// ---- gsl_function / Brent root solver ------------------------------------
struct gsl_function {
    double (*function)(double x, void *params);
    void *params;
};

struct gsl_root_fsolver {
    gsl_function *f;
    double a, b, fa, fb;   // bracketing interval
    double root;
};

typedef int gsl_root_fsolver_type;
static const gsl_root_fsolver_type gsl_root_fsolver_brent_obj = 0;
#define gsl_root_fsolver_brent (&gsl_root_fsolver_brent_obj)

inline gsl_root_fsolver *gsl_root_fsolver_alloc(const gsl_root_fsolver_type *) {
    return new gsl_root_fsolver();
}
inline void gsl_root_fsolver_free(gsl_root_fsolver *s) { delete s; }
inline const char *gsl_root_fsolver_name(gsl_root_fsolver *) { return "brent-shim"; }

inline int gsl_root_fsolver_set(gsl_root_fsolver *s, gsl_function *f, double x_lo,
                                double x_hi) {
    s->f = f;
    s->a = x_lo;
    s->b = x_hi;
    s->fa = f->function(x_lo, f->params);
    s->fb = f->function(x_hi, f->params);
    s->root = 0.5 * (x_lo + x_hi);
    if (!std::isfinite(s->fa) || !std::isfinite(s->fb)) return GSL_EINVAL;
    if ((s->fa < 0.0 && s->fb < 0.0) || (s->fa > 0.0 && s->fb > 0.0))
        return GSL_EINVAL;  // not bracketed — caller treats as "no intersection"
    return GSL_SUCCESS;
}

// One bisection-with-secant (regula falsi safeguarded) step: keeps the root
// bracketed like GSL's Brent; convergence is tested by the caller via
// gsl_root_test_interval so step efficiency only affects iteration count.
inline int gsl_root_fsolver_iterate(gsl_root_fsolver *s) {
    double a = s->a, b = s->b, fa = s->fa, fb = s->fb;
    double m = 0.5 * (a + b);
    double x = m;
    double denom = fb - fa;
    if (std::fabs(denom) > 1e-300) {
        double sec = b - fb * (b - a) / denom;  // secant estimate
        if (sec > std::fmin(a, b) && sec < std::fmax(a, b)) x = sec;
    }
    double fx = s->f->function(x, s->f->params);
    if (!std::isfinite(fx)) { x = m; fx = s->f->function(x, s->f->params); }
    if ((fa < 0.0) == (fx < 0.0)) { s->a = x; s->fa = fx; }
    else { s->b = x; s->fb = fx; }
    s->root = x;
    return GSL_SUCCESS;
}

inline double gsl_root_fsolver_root(gsl_root_fsolver *s) { return s->root; }
inline double gsl_root_fsolver_x_lower(gsl_root_fsolver *s) { return std::fmin(s->a, s->b); }
inline double gsl_root_fsolver_x_upper(gsl_root_fsolver *s) { return std::fmax(s->a, s->b); }

inline int gsl_root_test_interval(double x_lo, double x_hi, double epsabs,
                                  double epsrel) {
    double abs_lo = std::fabs(x_lo), abs_hi = std::fabs(x_hi);
    double min_abs = (x_lo > 0.0 || x_hi < 0.0) ? std::fmin(abs_lo, abs_hi) : 0.0;
    double tol = epsabs + epsrel * min_abs;
    return (std::fabs(x_hi - x_lo) < tol) ? GSL_SUCCESS : GSL_CONTINUE;
}

// ---- RNG + bivariate gaussian ---------------------------------------------
struct gsl_rng { uint64_t state; };
typedef int gsl_rng_type;
static const gsl_rng_type gsl_rng_default_obj = 0;
#define gsl_rng_default (&gsl_rng_default_obj)

inline void gsl_rng_env_setup() {}
inline gsl_rng *gsl_rng_alloc(const gsl_rng_type *) {
    gsl_rng *r = new gsl_rng();
    r->state = 0x853c49e6748fea9bULL;
    return r;
}
inline void gsl_rng_free(gsl_rng *r) { delete r; }

inline double gsl_rng_uniform(gsl_rng *r) {  // splitmix64
    uint64_t z = (r->state += 0x9e3779b97f4a7c15ULL);
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
    z ^= z >> 31;
    return (z >> 11) * 0x1.0p-53;
}

inline void gsl_ran_bivariate_gaussian(gsl_rng *r, double sigma_x, double sigma_y,
                                       double rho, double *x, double *y) {
    // Box-Muller; correlate via rho.
    double u1 = std::fmax(gsl_rng_uniform(r), 1e-300), u2 = gsl_rng_uniform(r);
    double u3 = std::fmax(gsl_rng_uniform(r), 1e-300), u4 = gsl_rng_uniform(r);
    double n1 = std::sqrt(-2.0 * std::log(u1)) * std::cos(2.0 * M_PI * u2);
    double n2 = std::sqrt(-2.0 * std::log(u3)) * std::cos(2.0 * M_PI * u4);
    *x = sigma_x * n1;
    *y = sigma_y * (rho * n1 + std::sqrt(1.0 - rho * rho) * n2);
}

#endif  // PBRT_GSL_SHIM_H
