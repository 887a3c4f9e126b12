// Native batched generalized-eigenvalue kernels (CPU).
//
// TPU-native equivalent of the reference's Cython LAPACK kernels
// (reference: pb_bss/extraction/cythonized/get_gev_vector.pyx:42
// `zhegvd` per-bin loop, c_eig.pyx:14 `zggev`): the hot path of the
// framework runs the Cholesky-whitened batched Jacobi eigensolver on
// the accelerator (pb_bss_tpu/ops/linalg.py); this library provides
// the CPU-native counterpart where the reference is native —
// multi-threaded over the frequency batch (the reference's C++ TBB
// variant, get_gev_vector_cpp.hpp:28, never wired its parallelism up;
// here std::thread does).
//
// Build: g++ -O3 -shared -fPIC gev_kernel.cpp -o libpbbss_gev.so
//        -l:liblapack.so.3 -lpthread
#include <complex>
#include <cstring>
#include <thread>
#include <vector>
#include <algorithm>

using cdouble = std::complex<double>;

extern "C" {
// LAPACK Fortran symbols (runtime liblapack.so.3; no dev headers).
void zhegvd_(const int* itype, const char* jobz, const char* uplo,
             const int* n, cdouble* a, const int* lda, cdouble* b,
             const int* ldb, double* w, cdouble* work, const int* lwork,
             double* rwork, const int* lrwork, int* iwork,
             const int* liwork, int* info);

void zggev_(const char* jobvl, const char* jobvr, const int* n,
            cdouble* a, const int* lda, cdouble* b, const int* ldb,
            cdouble* alpha, cdouble* beta, cdouble* vl, const int* ldvl,
            cdouble* vr, const int* ldvr, cdouble* work,
            const int* lwork, double* rwork, int* info);
}

namespace {

// Copy a row-major (d, d) matrix into a Fortran (column-major) buffer.
inline void to_fortran(const cdouble* src, cdouble* dst, int d) {
    for (int i = 0; i < d; ++i)
        for (int j = 0; j < d; ++j)
            dst[j * d + i] = src[i * d + j];
}

struct GevWorkspace {
    std::vector<cdouble> a, b, work;
    std::vector<double> w, rwork;
    std::vector<int> iwork;
    int lwork = -1, lrwork = -1, liwork = -1;

    void init(int d) {
        a.resize(d * d);
        b.resize(d * d);
        w.resize(d);
        // workspace query
        const int itype = 1, n = d;
        const char jobz = 'V', uplo = 'L';
        cdouble wkopt;
        double rwkopt;
        int iwkopt, info = 0, m1 = -1;
        zhegvd_(&itype, &jobz, &uplo, &n, a.data(), &n, b.data(), &n,
                w.data(), &wkopt, &m1, &rwkopt, &m1, &iwkopt, &m1,
                &info);
        lwork = static_cast<int>(wkopt.real());
        lrwork = static_cast<int>(rwkopt);
        liwork = iwkopt;
        work.resize(std::max(lwork, 1));
        rwork.resize(std::max(lrwork, 1));
        iwork.resize(std::max(liwork, 1));
    }
};

}  // namespace

extern "C" {

// Dominant generalized eigenvector of the pencil (phi_xx, phi_nn) per
// batch element; B-normalized like LAPACK (w^H phi_nn w = 1).
//
// phi_xx, phi_nn: row-major (batch, d, d) complex128 Hermitian.
// out: (batch, d) complex128.
// Returns 0 on success; the first nonzero LAPACK `info` otherwise.
int pb_bss_gev(int batch, int d, const cdouble* phi_xx,
               const cdouble* phi_nn, cdouble* out, int n_threads) {
    if (n_threads <= 0) {
        n_threads = static_cast<int>(
            std::thread::hardware_concurrency());
        if (n_threads <= 0) n_threads = 1;
    }
    n_threads = std::min(n_threads, batch > 0 ? batch : 1);

    std::vector<int> status(n_threads, 0);

    auto worker = [&](int tid) {
        GevWorkspace ws;
        ws.init(d);
        const int itype = 1, n = d;
        const char jobz = 'V', uplo = 'L';
        for (int f = tid; f < batch; f += n_threads) {
            to_fortran(phi_xx + static_cast<size_t>(f) * d * d,
                       ws.a.data(), d);
            to_fortran(phi_nn + static_cast<size_t>(f) * d * d,
                       ws.b.data(), d);
            int info = 0;
            zhegvd_(&itype, &jobz, &uplo, &n, ws.a.data(), &n,
                    ws.b.data(), &n, ws.w.data(), ws.work.data(),
                    &ws.lwork, ws.rwork.data(), &ws.lrwork,
                    ws.iwork.data(), &ws.liwork, &info);
            if (info != 0 && status[tid] == 0) status[tid] = info;
            // eigenvalues ascending -> dominant eigenvector is the
            // last column (Fortran layout: column d-1).
            const cdouble* v = ws.a.data() + (d - 1) * d;
            std::memcpy(out + static_cast<size_t>(f) * d, v,
                        sizeof(cdouble) * d);
        }
    };

    std::vector<std::thread> threads;
    for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker, t);
    for (auto& th : threads) th.join();

    for (int s : status)
        if (s != 0) return s;
    return 0;
}

// Batched general eigendecomposition of the pencil (a, b) via zggev.
// a, b: row-major (batch, d, d) complex128.
// eigenvalues: (batch, d) = alpha / beta; eigenvectors: (batch, d, d)
// row-major with eigenvectors in columns ([..., :, i]).
int pb_bss_eig(int batch, int d, const cdouble* a_in, const cdouble* b_in,
               cdouble* eigenvalues, cdouble* eigenvectors,
               int n_threads) {
    if (n_threads <= 0) {
        n_threads = static_cast<int>(
            std::thread::hardware_concurrency());
        if (n_threads <= 0) n_threads = 1;
    }
    n_threads = std::min(n_threads, batch > 0 ? batch : 1);

    std::vector<int> status(n_threads, 0);

    auto worker = [&](int tid) {
        std::vector<cdouble> a(d * d), b(d * d), alpha(d), beta(d);
        std::vector<cdouble> vr(d * d);
        std::vector<double> rwork(8 * d);
        const char jobvl = 'N', jobvr = 'V';
        const int n = d;
        // workspace query
        int lwork = -1, info = 0;
        cdouble wkopt;
        zggev_(&jobvl, &jobvr, &n, a.data(), &n, b.data(), &n,
               alpha.data(), beta.data(), nullptr, &n, vr.data(), &n,
               &wkopt, &lwork, rwork.data(), &info);
        lwork = static_cast<int>(wkopt.real());
        std::vector<cdouble> work(std::max(lwork, 1));

        for (int f = tid; f < batch; f += n_threads) {
            to_fortran(a_in + static_cast<size_t>(f) * d * d, a.data(), d);
            to_fortran(b_in + static_cast<size_t>(f) * d * d, b.data(), d);
            info = 0;
            zggev_(&jobvl, &jobvr, &n, a.data(), &n, b.data(), &n,
                   alpha.data(), beta.data(), nullptr, &n, vr.data(),
                   &n, work.data(), &lwork, rwork.data(), &info);
            if (info != 0 && status[tid] == 0) status[tid] = info;
            cdouble* ev = eigenvalues + static_cast<size_t>(f) * d;
            for (int i = 0; i < d; ++i) ev[i] = alpha[i] / beta[i];
            // Fortran (d, d) columns -> row-major with vectors in
            // columns: out[i, j] = vr[j * d + i]
            cdouble* vout = eigenvectors + static_cast<size_t>(f) * d * d;
            for (int i = 0; i < d; ++i)
                for (int j = 0; j < d; ++j)
                    vout[i * d + j] = vr[j * d + i];
        }
    };

    std::vector<std::thread> threads;
    for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker, t);
    for (auto& th : threads) th.join();

    for (int s : status)
        if (s != 0) return s;
    return 0;
}

}  // extern "C"
