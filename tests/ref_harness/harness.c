/* Parity harness: compiles the REFERENCE's own integrator headers
 * (read-only from /root/reference at test time — nothing is copied into
 * this repo) and evaluates RadiancePathTracing / RadianceDirectLighting
 * on rays supplied via stdin, so the framework's integrators can be
 * compared against the genuine C code, RNG stream and all.
 *
 * Build (see tests/test_reference_parity.py):
 *   gcc -O2 -ffp-contract=off -I <ref>/smallptgpu-v1.6 harness.c -lm
 *
 * Protocol (text, stdin -> stdout):
 *   N
 *   N lines:  rad px py pz ex ey ez cx cy cz refl
 *   M
 *   M lines:  ox oy oz dx dy dz seed0 seed1 direct_flag
 * Output, M lines:  r g b seed0' seed1'
 */
#include <stdio.h>
#include <stdlib.h>
#include <math.h>

#include "vec.h"
#include "geom.h"
#include "simplernd.h"
#include "geomfunc.h"

int main(void) {
  unsigned int n, m, i;
  if (scanf("%u", &n) != 1) return 1;
  Sphere *spheres = (Sphere *)malloc(sizeof(Sphere) * n);
  for (i = 0; i < n; i++) {
    int refl;
    if (scanf("%f %f %f %f %f %f %f %f %f %f %d", &spheres[i].rad,
              &spheres[i].p.x, &spheres[i].p.y, &spheres[i].p.z,
              &spheres[i].e.x, &spheres[i].e.y, &spheres[i].e.z,
              &spheres[i].c.x, &spheres[i].c.y, &spheres[i].c.z,
              &refl) != 11)
      return 2;
    spheres[i].refl = (enum Refl)refl;
  }
  if (scanf("%u", &m) != 1) return 3;
  for (i = 0; i < m; i++) {
    Ray ray;
    unsigned int s0, s1;
    int direct;
    if (scanf("%f %f %f %f %f %f %u %u %d", &ray.o.x, &ray.o.y, &ray.o.z,
              &ray.d.x, &ray.d.y, &ray.d.z, &s0, &s1, &direct) != 9)
      return 4;
    Vec r;
    if (direct)
      RadianceDirectLighting(spheres, n, &ray, &s0, &s1, &r);
    else
      RadiancePathTracing(spheres, n, &ray, &s0, &s1, &r);
    printf("%.9g %.9g %.9g %u %u\n", r.x, r.y, r.z, s0, s1);
  }
  free(spheres);
  return 0;
}
