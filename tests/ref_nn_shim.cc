// Test-only C shim over the reference's nn core (CRBM/RBM), built
// out-of-tree against the read-only checkout's sources so the differential
// tests can drive the ORIGINAL implementation through a stable C ABI
// (mirrors what src/gmm/src/pygmm.cc provides for the GMM core — the nn
// core ships no such binding, so the tests supply one).
//
// Built by tests/refbuild.py:
//   g++ -O2 -std=c++11 -fPIC -shared -I<ref>/src/nn/src/include \
//       ref_nn_shim.cc <ref>/src/nn/src/crbm.cc <ref>/src/nn/src/rbm.cc \
//       -o /tmp/refnn/libref_nn.so

#include "crbm.hh"
#include "rbm.hh"

#include <cmath>
#include <vector>

typedef std::vector<std::vector<real_t>> DenseDataset;

static DenseDataset to_dataset(const double *X, int n, int m) {
    DenseDataset out(n);
    for (int i = 0; i < n; i++)
        out[i] = std::vector<real_t>(X + (size_t)i * m, X + (size_t)(i + 1) * m);
    return out;
}

extern "C" {

void *crbm_new(int nr_hidden) { return new CRBM(nr_hidden); }

void *crbm_load(const char *path) {
    CRBM *c = new CRBM();
    c->load(path);
    c->trained = true;
    return c;
}

void crbm_dump(void *h, const char *path) { ((CRBM *)h)->dump(path); }

void crbm_free(void *h) { delete (CRBM *)h; }

int crbm_visible_size(void *h) { return ((CRBM *)h)->visible_layer_size; }
int crbm_hidden_size(void *h) { return ((CRBM *)h)->hidden_layer_size; }

// Train with the reference trainer (CRBMTrainer::train, crbm.cc:390-448).
void crbm_train(void *h, const double *X, int n, int m, double lr,
                int nr_epoch, int batch, int cd_k, double C,
                double momentum, unsigned long long seed) {
    CRBM *c = (CRBM *)h;
    c->random.seed(seed);
    DenseDataset data = to_dataset(X, n, m);
    CRBMTrainer trainer(lr, nr_epoch, batch, cd_k, /*verbose=*/false);
    trainer.C = C;
    trainer.momentum = momentum;
    trainer.nr_epoch_report = 0;
    trainer.nr_reconstruction_test = 0;
    trainer.nr_epoch_save = 0;
    c->fit(data, &trainer);
}

// Deterministic (no_random) round-trip error, crbm.cc:186-199.
double crbm_reconstruction_error(void *h, const double *X, int n, int m) {
    DenseDataset data = to_dataset(X, n, m);
    return ((CRBM *)h)->reconstruction_error(data);
}

// Deterministic single-vector reconstruction (hidden then visible pass,
// both noise-free) for elementwise comparison.
void crbm_reconstruct_det(void *h, const double *v_in, double *v_out, int m) {
    CRBM *c = (CRBM *)h;
    std::vector<real_t> v(v_in, v_in + m), hid(c->hidden_layer_size);
    // replicate _sample_hidden_layer / _sample_visible_layer with
    // no_random=true (crbm.cc:92-117) using the public fields
    for (int j = 0; j < c->hidden_layer_size; j++) {
        real_t act = c->hidden_layer_bias[j];
        for (int i = 0; i < m; i++) act += v[i] * c->w[i][j];
        act *= c->a_hidden[j];
        const auto &r = c->hidden_layer_range[j];
        hid[j] = r.first + (r.second - r.first) / (1.0 + std::exp(-act));
    }
    for (int i = 0; i < m; i++) {
        real_t act = c->visible_layer_bias[i];
        for (int j = 0; j < c->hidden_layer_size; j++)
            act += hid[j] * c->w[i][j];
        const auto &r = c->visible_layer_range[i];
        v_out[i] = r.first + (r.second - r.first) / (1.0 + std::exp(-act));
    }
}

void *rbm_new(int nr_visible, int nr_hidden) {
    return new RBM(nr_visible, nr_hidden);
}

void *rbm_load(const char *path) {
    RBM *r = new RBM();
    r->load(path);
    return r;
}

void rbm_dump(void *h, const char *path) { ((RBM *)h)->dump(path); }
void rbm_free(void *h) { delete (RBM *)h; }

// Deterministic hidden-unit activation probabilities
// p_j = sigmoid(b_j + sum_i v_i w_ij) (rbm.cc:138-146).
void rbm_hidden_prob(void *h, const double *v, double *p_out) {
    RBM *r = (RBM *)h;
    for (int j = 0; j < r->get_hidden_layer_size(); j++) {
        real_t act = r->hidden_layer_bias[j];
        for (int i = 0; i < r->get_visible_layer_size(); i++)
            act += v[i] * r->w[i][j];
        p_out[j] = 1.0 / (1.0 + std::exp(-act));
    }
}

// Deterministic visible-unit probabilities given a hidden vector
// (rbm.cc:149-157).
void rbm_visible_prob(void *h, const double *hid, double *p_out) {
    RBM *r = (RBM *)h;
    for (int i = 0; i < r->get_visible_layer_size(); i++) {
        real_t act = r->visible_layer_bias[i];
        for (int j = 0; j < r->get_hidden_layer_size(); j++)
            act += hid[j] * r->w[i][j];
        p_out[i] = 1.0 / (1.0 + std::exp(-act));
    }
}

}  // extern "C"
