/* Deterministic rand()/srand() interception for the RANSAC parity
 * harness (forced-include into every TU via -include).
 *
 * The reference matchers draw trials / control sets / subsample masks
 * with libc rand() and reseed with srand(time(NULL))
 * (RandomMatching.cpp:65,178, RandomNormalMatching.cpp:203-238, ...).
 * For golden parity the draw SEQUENCE must be reproducible in Python,
 * so rand is remapped to a 31-bit LCG with a process-global stream
 * (state defined once in the harness TU) and srand becomes a no-op —
 * tests/golden_io.py::DetRand replicates the identical sequence.
 */
#pragma once
#include <cstdlib>
#include <ctime>

extern unsigned int det_rand_state;
int det_rand(void);
void det_srand(unsigned int);
void det_reset(unsigned int seed);

/* later system headers re-export std::rand; make the remapped names
 * resolvable there too */
namespace std
{
using ::det_rand;
using ::det_srand;
}

#define rand det_rand
#define srand det_srand
